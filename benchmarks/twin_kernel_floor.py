"""Kernel-floor probe for the baseline twin: accumulate ONLY the time spent
inside the cv2 native kernels the reference calls (ORB detectAndCompute,
FLANN-LSH match, solvePnPRansac P3P).  1/(kernel ms per frame) is the FPS
ceiling of ANY frame loop - C++ included - around the same kernels on this
host: the strongest possible twin."""
import importlib.util
import json
import time

spec = importlib.util.spec_from_file_location("tw", "baseline/opencv_vo.py")
tw = importlib.util.module_from_spec(spec)
spec.loader.exec_module(tw)

acc = {"orb": 0.0, "flann": 0.0, "pnp": 0.0, "calls": {"orb": 0, "flann": 0, "pnp": 0}}


class _Timed:
    def __init__(self, obj, names):
        self._obj = obj
        self._names = names

    def __getattr__(self, name):
        attr = getattr(self._obj, name)
        key = self._names.get(name)
        if key is None:
            return attr

        def wrapped(*a, **k):
            t0 = time.perf_counter()
            out = attr(*a, **k)
            acc[key] += time.perf_counter() - t0
            acc["calls"][key] += 1
            return out

        return wrapped


_orig_init = tw.FrontEnd.__init__


def patched_init(self, *a, **k):
    _orig_init(self, *a, **k)
    self.orb = _Timed(self.orb, {"detectAndCompute": "orb"})
    self.flann = _Timed(self.flann, {"match": "flann"})


tw.FrontEnd.__init__ = patched_init

_orig_pnp = tw.cv2.solvePnPRansac


def timed_pnp(*a, **k):
    t0 = time.perf_counter()
    out = _orig_pnp(*a, **k)
    acc["pnp"] += time.perf_counter() - t0
    acc["calls"]["pnp"] += 1
    return out


tw.cv2.solvePnPRansac = timed_pnp

r = tw.run(n_frames=240, enable_ba=False)
n = r["frames_tracked"]
kernel_ms = (acc["orb"] + acc["flann"] + acc["pnp"]) * 1e3 / n
out = {
    "frames_tracked": n,
    "twin_frontend_fps_mean": r["fps_mean"],
    "twin_frontend_ms_per_frame": r["ms_per_frame_mean"],
    "kernel_ms_per_frame": kernel_ms,
    "kernel_floor_fps": 1e3 / kernel_ms,
    "orb_ms_per_frame": acc["orb"] * 1e3 / n,
    "flann_ms_per_frame": acc["flann"] * 1e3 / n,
    "pnp_ms_per_frame": acc["pnp"] * 1e3 / n,
    "calls": acc["calls"],
}
print(json.dumps(out, indent=2))
with open("benchmarks/twin_kernel_floor.json", "w") as f:
    json.dump(out, f, indent=2)
