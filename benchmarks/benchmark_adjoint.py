"""
Benchmark the adjoint gradient: dJ/d(prop, controls, ini_state, times)
through the full scanned FSI loop.

The reference's inverse-analysis workflow differentiates a trajectory
functional with a hand-written reverse loop of transposed solves
(reference: ``src/femvf/adjoint.py:96-131``, partly broken there — SURVEY
section 2.12); here it is one ``jax.value_and_grad`` through the
checkpointed ``lax.scan`` with IFT ``custom_vjp`` Newton solves, jitted
end-to-end on the accelerator.

Reports forward steps/s, value+grad steps/s, and the gradient overhead
factor (ideal remat adjoint is ~2-3x a forward pass: one forward
rematerialization + one transposed sweep).

Usage: python benchmark_adjoint.py [--steps 100]
"""

import argparse
import time

import numpy as np

from benchmarkutils import maybe_profile  # noqa: F401  (repo path setup)
from setup import setup_model, setup_transient_args


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--large", action="store_true",
                        help="large mesh through banded+btd (the"
                        " reverse sweep reuses the forward's carried"
                        " factors with exact-J^T refinement)")
    parser.add_argument("--h", type=float, default=0.006,
                        help="mesh size for --large (0.006 = 23.7k"
                        " dofs, 0.003 = 94.8k)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from vf_fem_tpu import forward

    if args.large:
        from benchmark_large import build_model

        model = build_model(args.h)
    else:
        model = setup_model()
    state0_bv, control, prop_bv = setup_transient_args(model)
    model.set_prop(prop_bv)
    print(f"device {jax.devices()[0].platform},"
          f" solid ndof = {model.solid.ndof}")

    state0 = {
        k: jnp.zeros_like(jnp.asarray(np.asarray(v)))
        for k, v in state0_bv.sub_items()
    }
    cs = forward._stack_controls(model, [control])
    prop_d = model.prop_to_dict(prop_bv)
    times = jnp.asarray(1e-4 * np.arange(args.steps + 1))

    if args.large:
        solver_prm = {
            "assembly": "banded",
            "linear_solver": "btd",
            "btd_store_dtype": "bfloat16",
            "jacobian_refresh_steps": 16,
            "fixed_iterations": 3,
            "stagnation_ratio": 0.5,
        }
    elif jax.devices()[0].platform == "cpu":
        solver_prm = {"stagnation_ratio": 0.5}
    else:
        solver_prm = {
            "stagnation_ratio": 0.5,
            "jacobian_update": "once_per_step",
            "jacobian_refresh_steps": 25,
            "jacobian_refresh_mode": "ns",
            "jacobian_full_refresh_windows": 4,
            # NOTE: no fixed_iterations here — the IFT custom_vjp assumes a
            # converged root; the adaptive stagnation stop certifies it
        }

    def loss(s0, cs_, p, ts):
        # terminal-window glottal-flow energy: a representative smooth
        # trajectory functional touching state, control and prop
        fin, traj, infos = forward.integrate_pure(
            model, s0, cs_, p, ts, solver_prm, use_remat=True
        )
        return jnp.sum(traj["q"][-20:] ** 2) * 1e-6

    def timeit(fn, label):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(state0, cs, prop_d, times))
        ct = time.perf_counter() - t0
        best = np.inf
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(state0, cs, prop_d, times))
            best = min(best, time.perf_counter() - t0)
        tps = args.steps / best
        print(f"{label}: {tps:.1f} steps/s (compile {ct:.0f}s)")
        return tps, out

    fwd_fn = jax.jit(loss)
    tps_fwd, val = timeit(fwd_fn, "forward (remat loss)")

    grad_fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))
    tps_grad, (val_g, grads) = timeit(grad_fn, "value+grad")

    g_s0, g_cs, g_p, g_t = grads
    g_emod = np.asarray(g_p["emod"])
    assert np.isfinite(g_emod).all(), "non-finite gradient"
    print(f"J = {float(val_g):.6e};"
          f" |dJ/demod| mean {np.abs(g_emod).mean():.3e}")
    print(f"gradient overhead: {tps_fwd / tps_grad:.2f}x forward"
          f" (remat adjoint ideal ~2-3x)")


if __name__ == "__main__":
    main()
