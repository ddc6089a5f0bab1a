"""
DP x TP: a batched stiffness study of a DOF-sharded mesh.

The two parallel axes compose in one program: the solid DOF axis is
partitioned in slabs over the `tp` mesh axis (per-slab assembly with
ppermute halos + distributed SPIKE direct solves — a mesh too large for
one chip), while a batch of stiffness variants shards over the `dp`
axis.  Per-variant physics matches the 1D-sharded run to solver
tolerance (~1e-9 explicit / ~1e-6 implicit); the adaptive
Newton/Picard loops iterate in dp-lockstep so the tp collectives stay
aligned (see docs/PARALLEL.md).

The reference cannot do any of this — it is explicitly single-process
(reference ``src/femvf/models/fsi.py:38-39``) and strictly serial over
parameter studies (``src/femvf/forward.py:169-185``).

Runs on virtual CPU devices here (set by __main__ below); on real
hardware drop the host-platform flag and build the mesh from
`jax.devices()`.

Usage: python examples/sharded_sweep.py [--devices 8] [--steps 40]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--devices", type=int, default=8)
    parser.add_argument("--dp", type=int, default=2,
                        help="devices on the variant (dp) axis")
    parser.add_argument("--steps", type=int, default=40)
    parser.add_argument("--batch", type=int, default=4)
    args = parser.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags
            + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import numpy as np
    from jax.sharding import Mesh

    from vf_fem_tpu import forward
    from vf_fem_tpu.load import load_fsi_model
    from vf_fem_tpu.mesh import vocal_fold_mesh
    from vf_fem_tpu.mesh.reorder import rcm_mesh
    from vf_fem_tpu.parallel.ddstep import DDIntegrator
    from vf_fem_tpu.residuals import fluid as flr, solid as slr

    ndp = args.dp
    ntp = args.devices // ndp
    mesh2 = Mesh(
        np.asarray(jax.devices()[: ndp * ntp]).reshape(ndp, ntp),
        ("dp", "shard"),
    )
    print(f"mesh: {ndp} dp x {ntp} tp devices")

    fem_mesh = rcm_mesh(vocal_fold_mesh(40, 20))
    ymax = fem_mesh.coords[:, 1].max()
    model = load_fsi_model(
        fem_mesh, slr.KelvinVoigt, flr.BernoulliSmoothMinSep,
        coupling="explicit",
    )
    prop = model.prop
    prop["emod"][:] = 5e4
    prop["rho"][:] = 1.0
    prop["eta"][:] = 3.0
    prop["nu"][:] = 0.45
    prop["ycontact"][:] = ymax + 0.05
    prop["kcontact"][:] = 1e8
    prop["rho_air"][:] = 1.1225e-3
    prop["zeta_min"][:] = 1e-3
    prop["zeta_sep"][:] = 1e-3
    prop["ymid"][:] = ymax + 0.01
    model.set_prop(prop)
    model.control["psub"][:] = 8000.0
    model.set_control(model.control)

    state0 = {k: np.zeros_like(np.asarray(v))
              for k, v in model.state0.sub_items()}
    cs = forward._stack_controls(model, [model.control])
    pd = model.prop_to_dict(model.prop)
    times = np.asarray(5e-5 * np.arange(args.steps + 1))

    B = args.batch
    emods = np.linspace(3e4, 9e4, B)
    prop_b = {
        k: np.broadcast_to(np.asarray(v), (B,) + np.shape(v)).copy()
        for k, v in pd.items()
    }
    prop_b["emod"] = np.broadcast_to(
        emods[:, None], (B, pd["emod"].shape[0])
    ).copy()
    state0_b = {
        k: np.broadcast_to(v, (B,) + v.shape).copy()
        for k, v in state0.items()
    }

    dd = DDIntegrator(
        model, mesh2, dp_axis="dp",
        params={"jacobian_refresh_steps": 8},
    )
    fin_b, traj_b, infos_b = dd.integrate_batch_pure(
        state0_b, cs, prop_b, times
    )
    q = np.asarray(traj_b["q"])  # (B, n_steps, 1)
    for i, e in enumerate(emods):
        print(
            f"emod {e/1e3:5.1f} kBa: max|u| ="
            f" {np.abs(np.asarray(traj_b['u'])[i]).max():.4e} cm,"
            f" q in [{q[i].min():8.2f}, {q[i].max():8.2f}] cm^3/s"
        )
    assert np.all(np.isfinite(np.asarray(infos_b.abs_err)))
    print(f"{B} variants x {args.steps} sharded steps OK"
          f" (max Newton iters {int(np.asarray(infos_b.num_iter).max())})")


if __name__ == "__main__":
    main()
