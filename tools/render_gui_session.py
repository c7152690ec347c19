"""Software-rendered interactive-GUI session recording.

This environment ships NO window system (no X server, no Xvfb, PySide6 not
installable), so neither the Qt nor the tkinter widget layer can open a real
window here (both are implemented and display-gated; tk_widgets.TkGUI opens
on any machine with $DISPLAY). To still demonstrate the interactive app
end-to-end, this tool registers a `SoftwareView` — a pure-PIL painter
implementing the same MainController `view` protocol (refresh(controller) +
text_to_console) as gui/widgets.py and gui/tk_widgets.py — then drives a real
click -> propagate -> commit session through the controller and saves each
refresh as a frame of the window: canvas with the live visualization,
minimap, timeline slider, memory gauges, console log, and the button row.

Writes docs/assets/gui_session.png (the final stitched storyboard).

Usage: PYTHONPATH= JAX_PLATFORMS=cpu python tools/render_gui_session.py
"""
import os
import sys
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CANVAS_W, CANVAS_H = 640, 360
SIDE_W = 220
WIN_W = CANVAS_W + SIDE_W + 24
WIN_H = CANVAS_H + 150

BG = (38, 40, 46)
PANEL = (52, 55, 62)
ACCENT = (120, 180, 255)
TEXT = (225, 225, 228)
GAUGE = (90, 200, 120)


class SoftwareView:
    """MainController `view`: paints the window layout into a PIL image on
    every refresh (same protocol as widgets.GUI / tk_widgets.TkGUI)."""

    BUTTONS = ("Fwd", "Bwd", "Stop", "Commit", "Clear", "Clear-NP",
               "Reset", "Undo", "Export")

    def __init__(self):
        self.console_lines = []
        self.frames = []  # (label, PIL image)
        self.label = ""

    def text_to_console(self, text):
        self.console_lines.append(str(text))

    def refresh(self, controller):
        img = Image.new("RGB", (WIN_W, WIN_H), BG)
        d = ImageDraw.Draw(img)

        # canvas: live visualization
        vis = controller.visualize()
        canvas = Image.fromarray(np.ascontiguousarray(vis[..., :3])).resize(
            (CANVAS_W, CANVAS_H))
        img.paste(canvas, (8, 8))
        d.rectangle([7, 7, 8 + CANVAS_W, 8 + CANVAS_H], outline=ACCENT)

        sx = CANVAS_W + 16
        # minimap
        mini = canvas.resize((SIDE_W, SIDE_W * CANVAS_H // CANVAS_W))
        img.paste(mini, (sx, 8))
        d.rectangle([sx - 1, 7, sx + SIDE_W, 8 + mini.height], outline=ACCENT)

        # console (last lines)
        cy = 16 + mini.height
        d.rectangle([sx - 1, cy, sx + SIDE_W, CANVAS_H + 8], fill=PANEL)
        for i, line in enumerate(self.console_lines[-14:]):
            d.text((sx + 4, cy + 4 + 12 * i), line[:34], fill=TEXT)

        # timeline slider
        ty = CANVAS_H + 20
        d.rectangle([8, ty, 8 + CANVAS_W, ty + 10], fill=PANEL)
        frac = controller.curr_ti / max(1, controller.T - 1)
        d.rectangle([8, ty, 8 + int(CANVAS_W * frac), ty + 10], fill=ACCENT)
        d.text((16 + CANVAS_W, ty), f"{controller.curr_ti} / {controller.T - 1}",
               fill=TEXT)

        # memory gauges
        g = controller.get_memory_gauges()
        gy = ty + 22
        for i, (name, val, mx) in enumerate((
                ("perm", g["permanent"], max(1, g["permanent"])),
                ("work", g["working"], max(1, g["working_max"])),
                ("LT", g["long_term"], max(1, g["long_term_max"])))):
            x0 = 8 + i * 170
            d.text((x0, gy), f"{name} {val}/{mx}", fill=TEXT)
            d.rectangle([x0 + 70, gy + 2, x0 + 160, gy + 12], fill=PANEL)
            d.rectangle([x0 + 70, gy + 2,
                         x0 + 70 + int(90 * min(1.0, val / mx)), gy + 12],
                        fill=GAUGE)
        d.text((8 + 3 * 170, gy),
               f"object: {controller.curr_object}  vis: {controller.vis_mode}",
               fill=TEXT)

        # button row
        by = gy + 24
        x = 8
        for b in self.BUTTONS:
            w = 8 * len(b) + 14
            d.rectangle([x, by, x + w, by + 22], fill=PANEL, outline=ACCENT)
            d.text((x + 7, by + 5), b, fill=TEXT)
            x += w + 6
        d.text((8, by + 30), f"[{self.label}]", fill=ACCENT)

        self.frames.append((self.label, img))


def main():
    from PIL import Image as PILImage

    from cutie_tpu.config import Config, eval_config
    from cutie_tpu.gui.main_controller import MainController
    from cutie_tpu.models import CUTIE
    from cutie_tpu.utils.get_default_model import ModelBundle
    from cutie_tpu.utils.palette import davis_palette
    from cutie_tpu.utils.weight_import import convert_torch_state_dict
    import jax
    import jax.numpy as jnp

    rec = dict(np.load(REPO / "tests/golden/stream_small_work.npz"))
    ws = Path("/tmp/gui_session_ws")
    img_dir = ws / "frames"
    os.makedirs(img_dir, exist_ok=True)
    for ti, f in enumerate(rec["frames"][:6]):
        arr = (np.transpose(f, (1, 2, 0)) * 255).astype(np.uint8)
        PILImage.fromarray(arr).save(img_dir / f"{ti:05d}.png")

    sd = dict(np.load(REPO / "tests/golden/state_dict_small.npz"))
    model_cfg = eval_config("small")
    model_cfg.merge({"mem_every": 3, "max_mem_frames": 3,
                     "use_long_term": False})
    model = CUTIE(model_cfg)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)),
                            jnp.zeros((1, 2, 64, 64)))
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), dict(shapes))
    variables = convert_torch_state_dict(sd, zeros, strict=False)
    bundle = ModelBundle(model=model, variables=variables, cfg=model_cfg)

    cfg = Config({
        "images": str(img_dir), "video": None,
        "workspace": str(ws / "workspace"),
        "num_objects": 2, "buffer_size": 20, "save_queue_size": 20,
        "num_save_threads": 2, "max_overall_size": -1,
        "max_internal_size": -1, "mem_every": 3, "use_long_term": False,
        "output_fps": 10,
    })
    view = SoftwareView()
    ctl = MainController(cfg, bundle=bundle, click_ckpt=None)
    ctl.view = view
    view.label = "open"
    view.text_to_console("session start")
    ctl.load_frame(0)

    # click (real RITM pass through ClickController)
    view.label = "click(+) at (30,20) on object 1"
    view.text_to_console("click +(30,20) obj1")
    ctl.click(30, 20)

    # import the GT mask (like the reference's import-mask flow) so
    # propagation tracks (the fixture model is tiny/random-ish)
    m = PILImage.fromarray(rec["mask0"].astype(np.uint8), mode="P")
    m.putpalette(davis_palette)
    mask_file = str(ws / "gt.png")
    m.save(mask_file)
    view.label = "import GT mask"
    view.text_to_console("import mask gt.png")
    ctl.import_mask(mask_file)

    view.label = "propagate forward"
    view.text_to_console("propagate forward ...")
    ctl.on_propagate("forward")

    view.label = "commit to permanent memory"
    view.text_to_console("commit -> permanent")
    ctl.on_commit()
    ctl.close()

    # storyboard: first frame of each labeled phase
    picks, seen = [], set()
    for label, img in view.frames:
        if label not in seen:
            seen.add(label)
            picks.append((label, img))
    # plus the last propagation frame (end state)
    picks.insert(-1, ("propagation end", view.frames[-2][1]))

    cols = 2
    rows = -(-len(picks) // cols)
    board = Image.new("RGB", (WIN_W * cols + 12, (WIN_H + 18) * rows + 6),
                      (20, 20, 24))
    d = ImageDraw.Draw(board)
    for i, (label, img) in enumerate(picks):
        x = 4 + (i % cols) * (WIN_W + 4)
        y = 4 + (i // cols) * (WIN_H + 18)
        board.paste(img, (x, y + 14))
        d.text((x, y), label, fill=(255, 255, 255))
    out = REPO / "docs" / "assets" / "gui_session.png"
    out.parent.mkdir(parents=True, exist_ok=True)
    board.save(out)
    print(f"wrote {out} ({len(view.frames)} refreshes, "
          f"{len(picks)} storyboard panels)")


if __name__ == "__main__":
    main()
