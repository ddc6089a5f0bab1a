"""
Production-config A/B at 23.7k dofs: btd vs SPIKE solves, same session.

Round-5 bisect: the block-Thomas solve chain is latency-bound (186
sequential block rows); SPIKE(S=16) cut the bare step scan from 1.871 to
1.694 ms/step.  This prices the full production integrate (refresh 96,
fixed-3 tail-free, bf16 factors, gc-256 banded plan) for each solver,
with the trajectory-error gate vs an exact-Jacobian run.

Usage: python probe_spike_prod.py [--h 0.006] [--lo 100] [--hi 400]
"""

import argparse
import time

import numpy as np

from benchmarkutils import maybe_profile  # noqa: F401  (repo path setup)
from setup import setup_transient_args
from benchmark_large import build_model

DT = 1e-4

BASE_TOL = {
    "assembly": "banded",
    "btd_store_dtype": "bfloat16",
    "jacobian_refresh_steps": 96,
    "fixed_iterations": 3,
    "fixed_tail_residual": False,
    "stagnation_ratio": 0.5,
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--h", type=float, default=0.006)
    parser.add_argument("--extrude", type=int, default=0, metavar="NZ",
                        help="extrude to 3D with NZ z-planes (>=2)")
    parser.add_argument("--lo", type=int, default=100)
    parser.add_argument("--hi", type=int, default=400)
    parser.add_argument(
        "--spikes", type=str, default="8,16",
        help="comma list of SPIKE partition counts to A/B",
    )
    parser.add_argument(
        "--refresh", type=str, default="",
        help="extra legs: comma list of S:refresh pairs, e.g. 8:128",
    )
    parser.add_argument(
        "--no-btd", action="store_true",
        help="skip the btd baseline leg (already measured this session)",
    )
    parser.add_argument(
        "--offdiag", type=str, default="",
        help="extra btd legs with fp8 off-diagonal factor storage:"
        " comma list of dtypes, e.g. float8_e4m3fn",
    )
    parser.add_argument(
        "--spike-offdiag", type=str, default="",
        help="extra spike legs S:dtype, e.g. 8:float8_e4m3fn",
    )
    parser.add_argument(
        "--btd-refresh", type=str, default="",
        help="extra btd legs at wider refresh windows: comma list of"
        " window lengths; suffix 'x' adds the extrapolated initial"
        " guess (correction-memory seed), e.g. 128,160x",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from vf_fem_tpu import forward

    m = build_model(args.h, nz=args.extrude)
    state0_bv, control, prop = setup_transient_args(m)
    m.set_prop(prop)
    state0 = {
        k: jnp.zeros_like(jnp.asarray(np.asarray(v)))
        for k, v in state0_bv.sub_items()
    }
    cs = forward._stack_controls(m, [control])
    pd = m.prop_to_dict(prop)
    print(f"device {jax.devices()[0].platform}, ndof={m.solid.ndof}",
          flush=True)

    # exact-Jacobian reference for the trajectory gate
    tol_x = dict(BASE_TOL)
    tol_x.pop("btd_store_dtype")
    tol_x["linear_solver"] = "btd"
    tol_x["jacobian_refresh_steps"] = 1
    times_g = jnp.asarray(DT * np.arange(args.lo + 1))
    fin_x, _, _ = forward.integrate_pure(m, state0, cs, pd, times_g, tol_x)
    ux = np.asarray(fin_x["u"])
    np.asarray(fin_x["u"])

    def leg(tag, tol):
        def run(L):
            times = jnp.asarray(DT * np.arange(L + 1))
            fin, _, _ = forward.integrate_pure(
                m, state0, cs, pd, times, tol
            )
            np.asarray(fin["u"])
            return fin

        best = {}
        fin_lo = None
        for L in (args.lo, args.hi):
            fin = run(L)
            if L == args.lo:
                fin_lo = fin
            b = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                run(L)
                b = min(b, time.perf_counter() - t0)
            best[L] = b
        tps = (args.hi - args.lo) / max(
            best[args.hi] - best[args.lo], 1e-9
        )
        err = float(
            np.abs(np.asarray(fin_lo["u"]) - ux).max()
            / max(np.abs(ux).max(), 1e-30)
        )
        print(f"{tag:22s} {tps:7.1f} steps/s ({1e3/tps:6.3f} ms/step)"
              f"  traj err {err:.2e}", flush=True)

    if not args.no_btd:
        leg("btd bf16", {**BASE_TOL, "linear_solver": "btd"})
    for S in (int(s) for s in args.spikes.split(",") if s):
        leg(
            f"spike{S} bf16",
            {**BASE_TOL, "linear_solver": "spike",
             "spike_partitions": S},
        )
    # wider refresh windows (factor is pricier than btd; check the
    # amortization trade at the bf16-factor staleness limit ~100 steps)
    for pair in (p for p in args.refresh.split(",") if p):
        S, r = (int(x) for x in pair.split(":"))
        leg(
            f"spike{S} bf16 r{r}",
            {**BASE_TOL, "linear_solver": "spike", "spike_partitions": S,
             "jacobian_refresh_steps": r},
        )
    for od in (o for o in args.offdiag.split(",") if o):
        od, _, r = od.partition(":")
        extra = {}
        if r.endswith("x"):
            extra["initial_guess"] = "extrapolated"
            r = r.rstrip("x")
        if r:
            extra["jacobian_refresh_steps"] = int(r)
        tag = f"btd bf16/{od[-6:]}" + (f" r{r}" if r else "")
        if "initial_guess" in extra:
            tag += " extrap"
        leg(
            tag,
            {**BASE_TOL, "linear_solver": "btd",
             "btd_offdiag_dtype": od, **extra},
        )
    for spec in (s for s in args.btd_refresh.split(",") if s):
        extrap = spec.endswith("x")
        r = int(spec.rstrip("x"))
        tol = {**BASE_TOL, "linear_solver": "btd",
               "jacobian_refresh_steps": r}
        if extrap:
            tol["initial_guess"] = "extrapolated"
        leg(f"btd bf16 r{r}" + (" extrap" if extrap else ""), tol)
    for pair in (p for p in args.spike_offdiag.split(",") if p):
        S, od = pair.split(":")
        leg(
            f"spike{S} bf16/{od[-6:]}",
            {**BASE_TOL, "linear_solver": "spike",
             "spike_partitions": int(S), "btd_offdiag_dtype": od},
        )


if __name__ == "__main__":
    main()
