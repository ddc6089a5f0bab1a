"""
Microbenchmark: decompose large-mesh residual-assembly time on the device.

Times, separately: the cg1 gathers (u[cells]-style), the vmapped element
kernel with pre-gathered locals, the segment-sum scatter, and the full
``res_u``.  Used to target the banded-assembly work (STATUS.md: residual
assembly is the remaining large-mesh cost center).

Usage: python probe_assembly.py [--h 0.006]
"""

import argparse
import time

import numpy as np

from benchmarkutils import maybe_profile  # noqa: F401  (repo path setup)
from setup import setup_transient_args
from benchmark_large import build_model


N_LO = 40
N_HI = 140


def timeit(fn, *args, n=4):
    """Time fn as the SLOPE between two jitted lax.scan lengths, synced
    by fetching the scalar carry to host.  Through the remote (axon)
    tunnel, per-call dispatch costs ~27 ms and ``block_until_ready`` can
    return before execution finishes; the host fetch is a reliable sync
    and the slope cancels the fixed round-trip (CLAUDE.md round-3)."""
    import jax
    import jax.numpy as jnp

    def make(length):
        def looped(args):
            def body(carry, _):
                # make inputs carry-dependent so XLA cannot hoist the
                # body out of the loop (loop-invariant code motion)
                args_p = jax.tree_util.tree_map(
                    lambda a: a + (carry * 1e-38).astype(a.dtype)
                    if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                    else a,
                    args,
                )
                out = fn(*args_p)
                # fold the output into a scalar carry (nothing dead)
                s = sum(
                    jnp.sum(leaf)
                    for leaf in jax.tree_util.tree_leaves(out)
                )
                return carry + s, None

            c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=length)
            return c

        return jax.jit(looped)

    run_lo, run_hi = make(N_LO), make(N_HI)
    np.asarray(run_lo(args))  # compile + warm
    np.asarray(run_hi(args))
    best_lo = best_hi = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(run_lo(args))
        best_lo = min(best_lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(run_hi(args))
        best_hi = min(best_hi, time.perf_counter() - t0)
    return max(best_hi - best_lo, 1e-12) / (N_HI - N_LO)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--h", type=float, default=0.006)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    model = build_model(args.h)
    solid = model.solid
    R = solid._residual
    topo = R.topology
    ndof = solid.ndof
    nvert = solid.nvert
    dim = solid.dim
    print(f"device {jax.devices()[0].platform}, ndof={ndof},"
          f" nc={topo.n_cells}, nf={topo.facet_cells.shape[0]}")

    state0_bv, control, prop = setup_transient_args(model)
    model.set_prop(prop)
    sprop = {k: jnp.asarray(np.asarray(v))
             for k, v in solid.prop.sub_items()}

    u = jnp.zeros(ndof)
    state0 = {"u": u, "v": u, "a": u}
    ctrl = {"p1": jnp.zeros(R.coefficient_shape("control/p1"))} \
        if "control/p1" in R.coefficient_spec else {}
    dt = 1e-4

    # full Newton residual
    res_u = jax.jit(lambda uu: solid.res_u(uu, state0, ctrl, sprop, dt))
    t = timeit(res_u, u)
    print(f"res_u total:            {t*1e3:8.3f} ms")

    # banded (gather-free Pallas) variant
    try:
        R.banded_plan()
        res_ub = jax.jit(
            lambda uu: solid.res_u(uu, state0, ctrl, sprop, dt, banded=True)
        )
        err = float(
            np.abs(np.asarray(res_ub(u)) - np.asarray(res_u(u))).max()
        )
        t = timeit(res_ub, u)
        print(f"res_u banded:           {t*1e3:8.3f} ms (|diff| {err:.2e})")
    except AssertionError as e:
        print(f"banded plan unavailable: {e}")

    # gathers only
    cells = topo.cells

    @jax.jit
    def gathers(uu):
        x = uu.reshape(nvert, dim)
        return (x[cells], x[cells], x[cells], x[cells])

    t = timeit(gathers, u)
    print(f"4x cg1 gathers:         {t*1e3:8.3f} ms")

    # element kernel with pre-gathered locals (cell pass only)
    prop_fields = solid._prop_fields(sprop)
    fields = dict(prop_fields)
    z2 = jnp.zeros((nvert, dim))
    fields["state/u1"] = z2
    fields["state/v1"] = z2
    fields["state/a1"] = z2
    if "control/p1" in R.coefficient_spec:
        fields["control/p1"] = jnp.zeros(R.coefficient_shape("control/p1"))
    if "control/tcontact" in R.coefficient_spec:
        fields["control/tcontact"] = jnp.zeros((nvert, dim))
    local, axes = R.gather_cell_locals(fields)
    local = jax.tree_util.tree_map(jnp.asarray, local)
    Xe = jnp.asarray(R.ref_mesh_coords)[cells]
    cell_elem = R.cell_elem_fn()

    @jax.jit
    def kern(Xe, local):
        return jax.vmap(cell_elem, in_axes=(0, axes))(Xe, local)

    t = timeit(kern, Xe, local)
    print(f"cell kernel (gathered): {t*1e3:8.3f} ms")
    res_c = kern(Xe, local)

    # SoA variant: batch axis LAST so per-element scalars are (nc,) lane
    # vectors instead of tiny padded trailing dims
    local_soa = {
        k: (jnp.moveaxis(v, 0, -1) if axes[k] == 0 else v)
        for k, v in local.items()
    }
    axes_soa = {k: (-1 if axes[k] == 0 else None) for k in axes}
    Xe_soa = jnp.moveaxis(Xe, 0, -1)

    @jax.jit
    def kern_soa(Xe, local):
        return jax.vmap(cell_elem, in_axes=(-1, axes_soa), out_axes=-1)(
            Xe, local
        )

    t = timeit(kern_soa, Xe_soa, local_soa)
    print(f"cell kernel (SoA):      {t*1e3:8.3f} ms")

    # scatter only
    from vf_fem_tpu.fem import assembly

    @jax.jit
    def scat(res_c):
        return assembly.scatter_add(res_c, cells, nvert)

    t = timeit(scat, res_c)
    print(f"segment_sum scatter:    {t*1e3:8.3f} ms")

    # streaming floor: sum the same bytes the gathers touch
    big = jnp.zeros((topo.n_cells, cells.shape[1], dim))

    @jax.jit
    def stream(a):
        return a.sum()

    t = timeit(stream, big)
    print(f"stream (nc,nv,dim) sum: {t*1e3:8.3f} ms")

    # ---- Jacobian-refresh path (amortized over the refresh window) ----
    from vf_fem_tpu.solvers import bsb as bsb_mod, btd as btd_mod

    jacb = jax.jit(
        lambda uu: solid.jac_u_blocks(uu, state0, ctrl, sprop, dt)
    )
    t = timeit(jacb, u, n=3)
    print(f"jac_u_blocks:           {t*1e3:8.3f} ms")
    Jc, Jf = jacb(u)
    plan = solid._get_bsb_plan()

    # NOTE the consumer must be NONLINEAR in the scatter output: the
    # timing harness reduces outputs with a plain sum, and XLA folds
    # sum-of-scatter-add into sum-of-sources (measured: an impossible
    # 0.001 ms).  Squaring defeats the rewrite (collisions interact).
    fill = jax.jit(
        lambda Jc, Jf: bsb_mod.bsb_fill(plan, [Jc, Jf]) ** 2
    )
    t = timeit(fill, Jc, Jf, n=3)
    print(f"bsb_fill (+square):     {t*1e3:8.3f} ms")
    blocks = bsb_mod.bsb_fill(plan, [Jc, Jf])

    # fill variants: host-sorted targets + sorted segment_sum presum to
    # unique nnz slots + unique-index scatter — probing whether XLA's
    # scatter-add is the serialization bottleneck
    tgt = np.asarray(plan.tgt_idx)
    keep = np.asarray(plan.src_keep)
    perm = np.argsort(tgt, kind="stable").astype(np.int32)
    tgt_sorted = tgt[perm]
    uniq, seg_start = np.unique(tgt_sorted, return_index=True)
    seg_ids = np.zeros(len(tgt_sorted), dtype=np.int32)
    seg_ids[seg_start[1:]] = 1
    seg_ids = np.cumsum(seg_ids).astype(np.int32)
    size = plan.nblk * plan.nb * plan.b * plan.b
    keep_j = jnp.asarray(keep[perm].astype(np.float64))

    @jax.jit
    def fill_sorted(Jc, Jf):
        src = jnp.concatenate([Jc.reshape(-1), Jf.reshape(-1)])
        srcp = src[jnp.asarray(perm)] * keep_j.astype(src.dtype)
        vals = jax.ops.segment_sum(
            srcp, jnp.asarray(seg_ids), num_segments=len(uniq),
            indices_are_sorted=True,
        )
        flat = jnp.zeros(size, src.dtype)
        flat = flat.at[jnp.asarray(uniq)].set(
            vals, unique_indices=True, indices_are_sorted=True
        )
        flat = flat.at[jnp.asarray(plan.diag_ones)].add(1.0)
        return flat.reshape(plan.nblk, plan.nb, plan.b, plan.b)

    fill_sorted_sq = jax.jit(lambda Jc, Jf: fill_sorted(Jc, Jf) ** 2)
    t = timeit(fill_sorted_sq, Jc, Jf, n=3)
    err = float(
        jnp.abs(fill_sorted(Jc, Jf) - blocks).max()
    )
    print(f"fill sorted (+square):  {t*1e3:8.3f} ms (|diff| {err:.1e})")

    fac = jax.jit(lambda b: btd_mod.btd_factor(plan, b))
    t = timeit(fac, blocks, n=3)
    print(f"btd_factor:             {t*1e3:8.3f} ms")

    # factors are jit ARGUMENTS (closed-over device arrays embed as HLO
    # constants — the remote compile service rejects >100MB programs)
    for sd in (None, "bfloat16"):
        tag = "bf16" if sd else "f32 "
        fT = btd_mod.btd_factor(plan, blocks, store_dtype=sd)
        solve = jax.jit(lambda f, r: btd_mod.btd_solve(plan, f, r))
        t = timeit(solve, fT, u, n=3)
        print(f"btd_solve  ({tag}):     {t*1e3:8.3f} ms")

    # PCR: the log-depth solve (2*log2(n_sup)+1 batched MXU matmuls, no
    # scan).  bf16 factors halve the ~6x-Thomas factor stream.
    from vf_fem_tpu.solvers import pcr as pcr_mod

    for sd in (None, "bfloat16"):
        facP_fn = jax.jit(
            lambda b, _sd=sd: pcr_mod.pcr_factor(plan, b, store_dtype=_sd)
        )
        t = timeit(facP_fn, blocks, n=3)
        tag = "bf16" if sd else "f32 "
        print(f"pcr_factor ({tag}):     {t*1e3:8.3f} ms")
        fP = facP_fn(blocks)
        solP = jax.jit(lambda f, r: pcr_mod.pcr_solve(plan, f, r))
        t = timeit(solP, fP, u, n=3)
        print(f"pcr_solve  ({tag}):     {t*1e3:8.3f} ms")

    # SPIKE-partitioned factorization: the scan shrinks from n_sup
    # sequential Bt-LU steps to n_sup/S batched ones (+ batched spike
    # solves) — the single-chip lever on the latency-bound btd_factor
    from vf_fem_tpu.solvers import spike as spike_mod

    for S in (8, 16, 32, 64):
        facS = jax.jit(
            lambda b: spike_mod.spike_factor(plan, b, n_parts=S)
        )
        t = timeit(facS, blocks, n=3)
        print(f"spike_factor (S={S:2d}):   {t*1e3:8.3f} ms")
        fS = facS(blocks)
        sol = jax.jit(lambda r: spike_mod.spike_solve(plan, fS, r))
        t = timeit(sol, u, n=3)
        print(f"spike_solve  (S={S:2d}):   {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
