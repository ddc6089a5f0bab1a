"""
HDF5 time-history state files.

Schema-compatible with the reference ``StateFile``
(reference: ``src/femvf/statefile.py:21-270``):

- ``time``: (T,) float
- ``meas_indices``: (M,) int
- ``mesh/solid/{coordinates, connectivity, dim}``
- ``dofmap/CG1``: vertex -> scalar-CG1 dof map
- ``state/{u,v,a,q,p}``: (T, ndof), chunked ``(NCHUNK, ndof)``
- ``control/*``: (T_c, n)
- ``properties/*``: (n,)
- ``solver_info/{num_iter, abs_err, rel_err}``: (T,)

The statefile doubles as the checkpoint/resume mechanism
(reference: ``forward.py:105-136``, SURVEY section 5.4).  Device arrays are
staged through host buffers; the scanned forward loop appends whole
trajectory windows at once (``append_window``) instead of per-step rows,
which removes the chunk-thrash the reference worked around with a custom
LRU cache (``statefile.py:443-523``).  A small row cache
(`CACHE_SIZE` chunks) still accelerates reverse-order adjoint reads.
"""

from __future__ import annotations

from collections import OrderedDict
import h5py
import numpy as np

from . import blocks as bv

NCHUNK = 100


class DatasetChunkCache:
    """LRU cache of chunk-rows for fast repeated/reverse row reads
    (reference: ``statefile.py:443-523``)."""

    def __init__(self, dataset: h5py.Dataset, num_chunks: int = 2):
        self.dataset = dataset
        self.chunk_rows = dataset.chunks[0] if dataset.chunks else NCHUNK
        self.num_chunks = num_chunks
        self.cache: OrderedDict[int, np.ndarray] = OrderedDict()

    def get(self, m: int) -> np.ndarray:
        m_chunk = m // self.chunk_rows
        if m_chunk in self.cache:
            self.cache.move_to_end(m_chunk)
        else:
            start = m_chunk * self.chunk_rows
            stop = min(start + self.chunk_rows, self.dataset.shape[0])
            self.cache[m_chunk] = self.dataset[start:stop][:]
            if len(self.cache) > self.num_chunks:
                self.cache.popitem(last=False)
        return self.cache[m_chunk][m % self.chunk_rows]


class StateFile:
    """
    HDF5 history of a transient run (reference: ``statefile.py:21-422``).

    Parameters
    ----------
    model:
        The transient model (used for state/control/prop layouts).
    fname:
        Path of the HDF5 file.
    group:
        HDF5 group to store the run under.
    """

    def __init__(
        self,
        model,
        fname: str,
        mode: str = "r",
        group: str = "/",
        NCHUNK: int = NCHUNK,
        **kwargs,
    ):
        self.model = model
        self.file = h5py.File(fname, mode=mode, **kwargs)
        self.group_name = group
        self.NCHUNK = NCHUNK
        if group not in self.file:
            self.file.require_group(group)
        self.root_group = self.file[group]

        self._caches: dict = {}

        self.dset_chunk_cache = None  # populated lazily on reads

    # -- Context manager ----------------------------------------------------
    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        self.close()

    def close(self):
        self.file.close()

    def __len__(self):
        return self.size

    @property
    def size(self) -> int:
        """Number of stored time points."""
        if "time" in self.root_group:
            return self.root_group["time"].shape[0]
        return 0

    @property
    def num_states(self) -> int:
        return self.size

    # -- Layout ---------------------------------------------------------------
    def init_layout(self):
        """Create all datasets (reference: ``statefile.py:163-270``)."""
        g = self.root_group
        if "time" not in g:
            g.create_dataset(
                "time", (0,), maxshape=(None,), chunks=(self.NCHUNK,),
                dtype=np.float64,
            )
        if "meas_indices" not in g:
            g.create_dataset(
                "meas_indices", (0,), maxshape=(None,), dtype=np.int64
            )
        self.init_mesh()
        self.init_state()
        self.init_control()
        self.init_solver_info()

    def init_mesh(self):
        g = self.root_group
        solid = getattr(self.model, "solid", None)
        if solid is None or "mesh" in g:
            return
        mesh = solid.residual.mesh()
        mg = g.require_group("mesh/solid")
        mg.create_dataset("coordinates", data=mesh.coords)
        mg.create_dataset("connectivity", data=np.asarray(mesh.cells))
        mg.create_dataset("dim", data=mesh.dim)
        dg = g.require_group("dofmap")
        # vertex-major ordering: scalar CG1 dof == vertex index
        dg.create_dataset(
            "CG1", data=np.arange(mesh.num_vertices, dtype=np.int64)
        )
        # Reference layout also records per-cell scalar and vector dofmaps
        # (reference ``statefile.py:33-35`` declares /dofmap/scalar and
        # /dofmap/vector; ``:212-218`` stores cell_dofs rows).  With this
        # package's vertex-major interleaved ordering the scalar cell dofs
        # ARE the connectivity rows, and vector dof = vertex*dim + comp.
        cells = np.asarray(mesh.cells, dtype=np.int64)
        dg.create_dataset("scalar", data=cells)
        vec = (
            cells[:, :, None] * mesh.dim
            + np.arange(mesh.dim, dtype=np.int64)[None, None, :]
        ).reshape(cells.shape[0], -1)
        dg.create_dataset("vector", data=vec)

    def _init_group_like(self, name: str, bvec: bv.BlockVector):
        g = self.root_group.require_group(name)
        for key, vec in bvec.sub_items():
            if key not in g:
                n = vec.size
                g.create_dataset(
                    key,
                    (0, n),
                    maxshape=(None, n),
                    chunks=(self.NCHUNK, n),
                    dtype=np.float64,
                )

    def init_state(self):
        self._init_group_like("state", self.model.state0)

    def init_control(self):
        self._init_group_like("control", self.model.control)

    def init_solver_info(self):
        g = self.root_group.require_group("solver_info")
        for key in ("num_iter", "abs_err", "rel_err"):
            if key not in g:
                g.create_dataset(
                    key, (0,), maxshape=(None,), chunks=(self.NCHUNK,),
                    dtype=np.float64,
                )

    # -- Append API (reference: ``statefile.py:273-339``) ---------------------
    @staticmethod
    def _append_rows(dset: h5py.Dataset, rows: np.ndarray):
        rows = np.atleast_1d(rows)
        n0 = dset.shape[0]
        dset.resize(n0 + rows.shape[0], axis=0)
        dset[n0:] = rows

    def append_state(self, state: bv.BlockVector):
        g = self.root_group["state"]
        for key, vec in state.sub_items():
            self._append_rows(g[key], np.asarray(vec).reshape(1, -1))

    def append_control(self, control: bv.BlockVector):
        g = self.root_group["control"]
        for key, vec in control.sub_items():
            self._append_rows(g[key], np.asarray(vec).reshape(1, -1))

    def append_time(self, time: float):
        self._append_rows(self.root_group["time"], np.array([time]))

    def append_meas_index(self, index: int):
        self._append_rows(
            self.root_group["meas_indices"], np.array([index], dtype=np.int64)
        )

    def append_solver_info(self, info: dict):
        g = self.root_group["solver_info"]
        for key in ("num_iter", "abs_err", "rel_err"):
            value = info.get(key, np.nan)
            self._append_rows(g[key], np.array([float(value)]))

    def append_prop(self, prop: bv.BlockVector):
        g = self.root_group.require_group("properties")
        for key, vec in prop.sub_items():
            if key not in g:
                g.create_dataset(key, data=np.asarray(vec))

    # -- Windowed append (scan output) ----------------------------------------
    def append_window(
        self,
        states: dict,
        controls: dict,
        times: np.ndarray,
        solver_info: dict,
    ):
        """
        Append a whole trajectory window at once: ``states[key]`` has shape
        ``(T, n)``.  This is the fast path fed by the jitted ``lax.scan``
        forward loop (device -> host transfer at window granularity).
        """
        sg = self.root_group["state"]
        for key, arr in states.items():
            self._append_rows(sg[key], np.asarray(arr))
        cg = self.root_group["control"]
        for key, arr in controls.items():
            self._append_rows(cg[key], np.asarray(arr))
        self._append_rows(self.root_group["time"], np.asarray(times))
        ig = self.root_group["solver_info"]
        for key in ("num_iter", "abs_err", "rel_err"):
            self._append_rows(
                ig[key], np.asarray(solver_info[key], dtype=np.float64)
            )

    # -- Read API (reference: ``statefile.py:342-422``) ------------------------
    def _row_cache(self, path: str) -> DatasetChunkCache:
        if path not in self._caches:
            self._caches[path] = DatasetChunkCache(self.root_group[path])
        return self._caches[path]

    def get_state(self, n: int) -> bv.BlockVector:
        keys = list(self.model.state0.keys())
        n = int(n) % max(self.size, 1) if n < 0 else int(n)
        vecs = [self._row_cache(f"state/{k}").get(n) for k in keys]
        return bv.BlockVector(vecs, labels=[tuple(keys)])

    def get_control(self, n: int) -> bv.BlockVector:
        keys = list(self.model.control.keys())
        g = self.root_group["control"]
        n_c = g[keys[0]].shape[0]
        m = min(int(n), n_c - 1)
        vecs = [self._row_cache(f"control/{k}").get(m) for k in keys]
        return bv.BlockVector(vecs, labels=[tuple(keys)])

    def get_prop(self) -> bv.BlockVector:
        keys = list(self.model.prop.keys())
        g = self.root_group["properties"]
        vecs = [g[k][()] for k in keys]
        return bv.BlockVector(vecs, labels=[tuple(keys)])

    def get_time(self, n: int) -> float:
        return float(self.root_group["time"][n])

    def get_times(self) -> np.ndarray:
        return self.root_group["time"][:]

    def get_meas_indices(self) -> np.ndarray:
        return self.root_group["meas_indices"][:]

    def get_solver_info(self, n: int) -> dict:
        g = self.root_group["solver_info"]
        return {k: g[k][n] for k in ("num_iter", "abs_err", "rel_err")}

    # convenience: full trajectories as dict-of-arrays (for functionals)
    def get_state_trajectory(self) -> dict:
        g = self.root_group["state"]
        return {k: g[k][:] for k in g}

    def get_control_trajectory(self) -> dict:
        g = self.root_group["control"]
        return {k: g[k][:] for k in g}
