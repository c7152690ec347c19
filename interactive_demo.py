"""Interactive GUI demo entry point.

Behavioral parity target: reference interactive_demo.py:14-81 — argument
parsing (images/video/workspace/num_objects), config composition, window
launch. Prefers PySide6 (gui/widgets.py); falls back to a stdlib-tkinter
window with the same surface (gui/tk_widgets.py). The headless
MainController (all of the logic) is importable without either.
"""
import argparse
import logging
import sys


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", default=None, help="directory of frames")
    parser.add_argument("--video", default=None, help="video file")
    parser.add_argument("--workspace", default=None)
    parser.add_argument("--num_objects", type=int, default=1)
    parser.add_argument("--weights", default=None, help="CUTIE .pth/.npz weights")
    parser.add_argument("--ritm_weights", default=None,
                        help="RITM click-model .pth")
    parser.add_argument("--max_internal_size", type=int, default=480)
    parser.add_argument("--max_overall_size", type=int, default=1080)
    parser.add_argument("--workspace_init_only", action="store_true")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    from cutie_tpu.config import Config

    # mirrors reference cutie/config/gui_config.yaml defaults
    cfg = Config({
        "images": args.images,
        "video": args.video,
        "workspace": args.workspace,
        "num_objects": args.num_objects,
        "weights": args.weights,
        "max_internal_size": args.max_internal_size,
        "max_overall_size": args.max_overall_size,
        "buffer_size": 20,
        "save_queue_size": 20,
        "num_save_threads": 4,
        "num_read_workers": 4,
        "use_long_term": True,
        "mem_every": 5,
        "output_fps": 24,
        # bf16 compute (reference gui_config.yaml:11 runs amp: True)
        "amp": True,
    })

    from cutie_tpu.gui.main_controller import MainController

    controller = MainController(cfg, click_ckpt=args.ritm_weights)
    if args.workspace_init_only:
        controller.close()
        return

    from cutie_tpu.gui.widgets import HAS_QT

    if HAS_QT:
        from PySide6.QtWidgets import QApplication

        from cutie_tpu.gui.widgets import GUI

        app = QApplication(sys.argv)
        gui = GUI(controller, cfg)
        gui.show()
        code = app.exec()
        controller.close()
        sys.exit(code)

    # PySide6 unavailable: stdlib tkinter fallback with the same surface
    from cutie_tpu.gui.tk_widgets import TkGUI, require_tk, tk_display_available

    require_tk()
    if not tk_display_available():
        raise RuntimeError(
            "No GUI backend can open a window: PySide6 is not installed and "
            "tkinter found no X display ($DISPLAY unset / no X server). The "
            "headless MainController exposes every operation programmatically;"
            " tools/render_gui_session.py produces a software-rendered "
            "session recording.")
    gui = TkGUI(controller, cfg)
    gui.mainloop()


if __name__ == "__main__":
    main()
