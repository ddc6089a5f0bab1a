"""
Microbenchmark: batched tiny matmuls (what vmapped per-element kernels
lower to) vs unrolled elementwise formulations, on the device.

Decides whether the element-kernel cost center (probe_assembly.py: 2.5 ms
at 23k dofs vs a 0.3 ms streaming floor) is the per-element small
contractions, and what rewriting them buys.
"""

import time

import numpy as np

from benchmarkutils import maybe_profile  # noqa: F401  (repo path setup)

N_INNER = 100


def timeit(run, *args, n=5):
    import jax

    out = run(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = run(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / N_INNER


def loop(fn):
    import jax
    import jax.numpy as jnp

    def looped(*args):
        def body(c, _):
            args_p = jax.tree_util.tree_map(
                lambda a: a + (c * 1e-38).astype(a.dtype), args
            )
            out = fn(*args_p)
            s = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(out))
            return c + s, None

        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=N_INNER)
        return c

    return jax.jit(looped)


def main():
    import jax
    import jax.numpy as jnp

    nc = 23319
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((nc, 3, 2)), dtype=jnp.float32)
    BARY = jnp.asarray(rng.standard_normal((3, 3)), dtype=jnp.float32)

    # A: vmapped tiny matmul (current formulation)
    def a_fn(U):
        return jax.vmap(lambda ue: BARY @ ue)(U)

    # B: unrolled elementwise (broadcast multiply-add)
    def b_fn(U):
        cols = [
            sum(BARY[q, k] * U[:, k, :] for k in range(3)) for q in range(3)
        ]
        return jnp.stack(cols, axis=1)

    print(f"one (3,3)@(3,2) over nc={nc}:")
    print(f"  A vmapped matmul:   {timeit(loop(a_fn), U)*1e6:8.1f} us")
    print(f"  B unrolled:         {timeit(loop(b_fn), U)*1e6:8.1f} us")

    # chain of 6 contractions (kernel-like): interp, grad, stress, ...
    G = jnp.asarray(rng.standard_normal((nc, 3, 2)), dtype=jnp.float32)

    def chain_a(U, G):
        def cell(ue, ge):
            uq = BARY @ ue  # (3,2)
            F = ue.T @ ge  # (2,2)
            S = F @ F.T
            r = ge @ S.T  # (3,2)
            w = BARY.T @ uq
            return r + w

        return jax.vmap(cell)(U, G)

    def chain_b(U, G):
        uq = jnp.stack(
            [sum(BARY[q, k] * U[:, k, :] for k in range(3)) for q in range(3)],
            axis=1,
        )
        F = jnp.stack(
            [
                jnp.stack(
                    [
                        sum(U[:, k, i] * G[:, k, j] for k in range(3))
                        for j in range(2)
                    ],
                    axis=-1,
                )
                for i in range(2)
            ],
            axis=-2,
        )
        S = jnp.stack(
            [
                jnp.stack(
                    [
                        sum(F[:, i, k] * F[:, j, k] for k in range(2))
                        for j in range(2)
                    ],
                    axis=-1,
                )
                for i in range(2)
            ],
            axis=-2,
        )
        r = jnp.stack(
            [
                jnp.stack(
                    [
                        sum(G[:, v, k] * S[:, i, k] for k in range(2))
                        for i in range(2)
                    ],
                    axis=-1,
                )
                for v in range(3)
            ],
            axis=-2,
        )
        w = jnp.stack(
            [
                sum(BARY[k, q] * uq[:, k, :] for k in range(3))
                for q in range(3)
            ],
            axis=1,
        )
        return r + w

    ra = chain_a(U, G)
    rb = chain_b(U, G)
    err = float(jnp.abs(ra - rb).max())
    print(f"chain of 6 contractions (agree to {err:.1e}):")
    print(f"  A vmapped matmuls:  {timeit(loop(chain_a), U, G)*1e6:8.1f} us")
    print(f"  B unrolled:         {timeit(loop(chain_b), U, G)*1e6:8.1f} us")

    # C: SoA-native unrolled — per-component (nc,) arrays end to end
    U_soa = jnp.moveaxis(U, 0, -1)  # (3, 2, nc)
    G_soa = jnp.moveaxis(G, 0, -1)

    def chain_c(U, G):
        uq = [
            [sum(BARY[q, k] * U[k][i] for k in range(3)) for i in range(2)]
            for q in range(3)
        ]
        F = [
            [sum(U[k][i] * G[k][j] for k in range(3)) for j in range(2)]
            for i in range(2)
        ]
        S = [
            [sum(F[i][k] * F[j][k] for k in range(2)) for j in range(2)]
            for i in range(2)
        ]
        r = [
            [sum(G[v][k] * S[i][k] for k in range(2)) for i in range(2)]
            for v in range(3)
        ]
        w = [
            [sum(BARY[k, q] * uq[k][i] for k in range(3)) for i in range(2)]
            for q in range(3)
        ]
        out = [[r[v][i] + w[v][i] for i in range(2)] for v in range(3)]
        return jnp.stack(
            [jnp.stack(row, axis=0) for row in out], axis=0
        )  # (3, 2, nc)

    rc = chain_c(
        [[U_soa[k, i] for i in range(2)] for k in range(3)],
        [[G_soa[k, i] for i in range(2)] for k in range(3)],
    )
    err = float(jnp.abs(jnp.moveaxis(rc, -1, 0) - ra).max())
    print(f"  C SoA unrolled (agree to {err:.1e}):"
          f" {timeit(loop(lambda U, G: chain_c([[U[k, i] for i in range(2)] for k in range(3)], [[G[k, i] for i in range(2)] for k in range(3)])), U_soa, G_soa)*1e6:8.1f} us")


if __name__ == "__main__":
    main()
