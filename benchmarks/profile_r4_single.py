"""Round-4 profiling: where does the single-stream frame budget go?

Times track_step and ba_step separately at production shapes on the real
chip, plus a build_problem/LM split of the BA program.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from rgbd_visualodometry_tpu.config import VOConfig
from rgbd_visualodometry_tpu.pipeline.system import VisualOdometry
from rgbd_visualodometry_tpu.pipeline import backend as backend_mod
from rgbd_visualodometry_tpu.io import synthetic


def make_frames(cfg, n, seed=0):
    scene = synthetic.SyntheticScene(
        width=cfg.image_width, height=cfg.image_height,
        fx=cfg.camera_fx, fy=cfg.camera_fy, cx=cfg.camera_cx, cy=cfg.camera_cy,
        seed=seed,
    )
    return synthetic.generate_sequence(
        n, scene=scene, step_t=(0.012, 0.002, 0.0), step_r=(0.0, 0.0, 0.003)
    )


def timeit(fn, n=20):
    fn()  # warm
    jax.effects_barrier()
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / n


def main():
    cfg = VOConfig()
    seq = make_frames(cfg, 80)
    vo = VisualOdometry(cfg)
    staged = [(vo.put_frame(f.rgb, f.depth, f.timestamp), f.timestamp) for f in seq]
    jax.block_until_ready([s for s, _ in staged])
    # populate the map
    for f, ts in staged:
        vo.process_async(f, timestamp=ts)
    vo.drain(0)
    jax.block_until_ready(vo.state)
    n_kf = sum(r.is_keyframe for r in vo.results)
    print(f"populated: {len(seq)} frames, {n_kf} keyframes, "
          f"map={vo.results[-1].stats['num_mappoints']}")

    state = vo.state

    # 1. track_step alone (state not donated here: copy first)
    step = jax.jit(functools.partial(
        __import__('rgbd_visualodometry_tpu.pipeline.frontend', fromlist=['track_step']).track_step,
        cfg, vo.camera))
    frame = staged[40][0]

    def run_track():
        return step(state, frame)[1].packed

    t_track = timeit(run_track)
    print(f"track_step: {t_track*1e3:.2f} ms")

    # 2. ba_step alone
    ba = jax.jit(functools.partial(backend_mod.ba_step, cfg, vo.camera))
    kf = jnp.int32(max(0, int(np.asarray(state.num_kf)) - 1))

    def run_ba():
        return ba(state, kf)[1]

    t_ba = timeit(run_ba, n=10)
    print(f"ba_step: {t_ba*1e3:.2f} ms")

    # 3. build_problem alone
    build = jax.jit(functools.partial(backend_mod.build_problem, cfg))

    def run_build():
        return build(state, kf)

    t_build = timeit(run_build, n=10)
    print(f"build_problem: {t_build*1e3:.2f} ms")

    # 4. one LM phase alone (10 iters)
    prob = jax.block_until_ready(build(state, kf))

    @jax.jit
    def run_phase():
        poses0 = jnp.take(state.kf_pose, prob.widx, axis=0)
        pts0 = jnp.take(state.mp_pos, prob.pidx, axis=0)
        return backend_mod._lm_phase(
            cfg, vo.camera, prob, poses0, pts0, prob.o_valid,
            cfg.ba_iterations, cfg.huber_delta)

    t_phase = timeit(run_phase, n=10)
    print(f"one _lm_phase (<=10 iters): {t_phase*1e3:.2f} ms")

    # how often BA fires: keyframe rate
    print(f"kf rate: {n_kf}/{len(seq)} = every {len(seq)/max(n_kf,1):.1f} frames")


if __name__ == "__main__":
    main()
