"""cProfile the HOST side of warm RITM clicks (where does non-device time go?).

Warms two full click passes (compiles), then cProfiles a third and prints
the top cumulative functions plus per-transform wall times. Complements
profile_click_trace.py (device trace) — run this when warm click wall time
exceeds the device-probed time.

Usage: python tools/profile_click_host.py
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import importlib
    bench = importlib.import_module("bench")
    from cutie_tpu.ritm.utils import ClickController

    H, W = bench.H, bench.W
    ctrl = ClickController(None)
    frame = bench.synth_video(1, H, W)[0][0]
    image = np.transpose(frame, (2, 0, 1)).astype(np.float32) / 255.0

    def click_pass(label):
        ctrl.unanchor()
        ctrl.interact(image, W // 3, H // 3, True)
        lat = []
        for i in range(5):
            t0 = time.perf_counter()
            out = ctrl.interact(image, W // 3 + 10 * (i + 1), H // 3,
                                i % 2 == 0)
            np.asarray(out)
            lat.append(time.perf_counter() - t0)
        print(f"{label}: per-click ms {[f'{x * 1e3:.0f}' for x in lat]} "
              f"median {np.median(lat) * 1e3:.1f}", flush=True)

    click_pass("warmup1")
    click_pass("warmup2")

    prof = cProfile.Profile()
    prof.enable()
    click_pass("profiled")
    prof.disable()
    s = io.StringIO()
    st = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    st.print_stats(45)
    # keep only the table, trim absurdly long paths
    for line in s.getvalue().splitlines():
        print(line[:200], flush=True)


if __name__ == "__main__":
    main()
