"""
Labeled block vectors as thin wrappers over dict-of-arrays.

The reference library builds on the external ``blockarray`` package
(``BlockVector``/``BlockMatrix`` wrapping numpy/PETSc/dolfin sub-tensors; API
inferred from call sites, see reference ``src/femvf/models/transient.py:13-22``
and SURVEY.md section 2.11).  In a TPU-native design the natural "block
vector" is a labeled pytree (an ordered dict of arrays): it is what
``jax.jit``/``grad``/``vmap`` consume directly and removes the external
dependency entirely.

``BlockVector`` here is a mutable, host-side convenience wrapper providing
the reference's driver-script API (``model.prop['emod'][:] = ...``,
``bv.concatenate``, ``bv.chunk``, fancy multi-key indexing, ``norm`` ...).
The pure compute path never sees it: models convert to/from plain dicts via
``to_dict()`` / ``BlockVector.from_dict()`` at the jit boundary.
"""

from __future__ import annotations

from typing import Iterable, Mapping, Sequence, Union

import numpy as np

Array = np.ndarray


def _as_1d_array(vec) -> np.ndarray:
    arr = np.asarray(vec)
    if arr.ndim == 0:
        arr = arr.reshape(1)
    return arr


class BlockVector:
    """
    An ordered, labeled collection of 1D sub-vectors.

    Parameters
    ----------
    subvecs:
        Iterable of array-likes (each is stored as a 1D numpy array).
    labels:
        Either a flat sequence of labels or the reference's convention of a
        1-tuple/list containing the label sequence (``labels=[('u','v')]``).
    """

    def __init__(self, subvecs: Iterable, shape=None, labels=None):
        subvecs = [np.array(_as_1d_array(v), dtype=None, copy=True) for v in subvecs]
        if labels is None:
            labels = [tuple(str(i) for i in range(len(subvecs)))]
        if len(labels) == 1 and isinstance(labels[0], (tuple, list)):
            keys = tuple(labels[0])
        else:
            keys = tuple(labels)
        if len(keys) != len(subvecs):
            raise ValueError(
                f"Number of labels ({len(keys)}) != number of sub-vectors"
                f" ({len(subvecs)})"
            )
        self._keys = keys
        self._vecs = dict(zip(keys, subvecs))

    # -- Constructors --------------------------------------------------
    @classmethod
    def from_dict(cls, data: Mapping[str, Array]) -> "BlockVector":
        return cls(list(data.values()), labels=[tuple(data.keys())])

    def to_dict(self) -> dict:
        """Return the underlying dict-of-arrays (no copy)."""
        return dict(self._vecs)

    def copy(self) -> "BlockVector":
        return BlockVector(
            [v.copy() for v in self._vecs.values()], labels=[self._keys]
        )

    # -- Introspection --------------------------------------------------
    @property
    def labels(self):
        return (self._keys,)

    def keys(self):
        return list(self._keys)

    @property
    def blocks(self):
        return tuple(self._vecs[k] for k in self._keys)

    @property
    def sub_blocks(self):
        return tuple(self._vecs[k] for k in self._keys)

    def sub_items(self):
        return [(k, self._vecs[k]) for k in self._keys]

    @property
    def sub(self):
        return _SubAccessor(self)

    @property
    def bshape(self):
        return (tuple(v.size for v in self.blocks),)

    @property
    def shape(self):
        return (len(self._keys),)

    @property
    def f_shape(self):
        return (self.size,)

    @property
    def size(self) -> int:
        return int(sum(v.size for v in self.blocks))

    @property
    def mshape(self):
        return tuple(v.shape for v in self.blocks)

    # -- Get / set -------------------------------------------------------
    def _key_index(self, key: Union[int, str]) -> str:
        if isinstance(key, (int, np.integer)):
            return self._keys[key]
        return key

    def __getitem__(self, key):
        if isinstance(key, slice):
            return BlockVector(
                [v for v in self.blocks[key]], labels=[self._keys[key]]
            )
        if isinstance(key, (list, tuple)):
            keys = [self._key_index(k) for k in key]
            return BlockVector([self._vecs[k] for k in keys], labels=[tuple(keys)])
        return self._vecs[self._key_index(key)]

    def __setitem__(self, key, value):
        if isinstance(key, slice):
            sel = list(self._keys[key])
            if isinstance(value, BlockVector):
                for k, v in zip(sel, value.blocks):
                    self._vecs[k][...] = np.asarray(v).reshape(self._vecs[k].shape)
            elif np.isscalar(value) or (
                isinstance(value, np.ndarray) and value.ndim == 0
            ):
                for k in sel:
                    self._vecs[k][...] = value
            elif isinstance(value, Mapping):
                for k in sel:
                    self._vecs[k][...] = np.asarray(value[k]).reshape(
                        self._vecs[k].shape
                    )
            else:
                # flat concatenated assignment
                flat = np.asarray(value).reshape(-1)
                offs = 0
                for k in sel:
                    n = self._vecs[k].size
                    self._vecs[k][...] = flat[offs : offs + n].reshape(
                        self._vecs[k].shape
                    )
                    offs += n
        elif isinstance(key, (list, tuple)):
            for k in key:
                self[k] = value[k] if isinstance(value, (Mapping, BlockVector)) else value
        else:
            k = self._key_index(key)
            self._vecs[k][...] = value

    def __contains__(self, key) -> bool:
        return key in self._vecs

    def __iter__(self):
        return iter(self.blocks)

    def __len__(self):
        return len(self._keys)

    # -- Conversions -----------------------------------------------------
    def to_mono_ndarray(self) -> np.ndarray:
        return np.concatenate([np.asarray(v).reshape(-1) for v in self.blocks])

    def set_mono(self, flat: Array):
        self[:] = flat

    # -- Math --------------------------------------------------------------
    def _binary(self, other, op) -> "BlockVector":
        if isinstance(other, BlockVector):
            vecs = [op(a, b) for a, b in zip(self.blocks, other.blocks)]
        else:
            vecs = [op(a, other) for a in self.blocks]
        return BlockVector(vecs, labels=[self._keys])

    def __add__(self, other):
        return self._binary(other, lambda a, b: a + b)

    def __radd__(self, other):
        return self._binary(other, lambda a, b: b + a)

    def __sub__(self, other):
        return self._binary(other, lambda a, b: a - b)

    def __rsub__(self, other):
        return self._binary(other, lambda a, b: b - a)

    def __mul__(self, other):
        return self._binary(other, lambda a, b: a * b)

    def __rmul__(self, other):
        return self._binary(other, lambda a, b: b * a)

    def __truediv__(self, other):
        return self._binary(other, lambda a, b: a / b)

    def __neg__(self):
        return self._binary(-1.0, lambda a, b: a * b)

    def norm(self) -> float:
        return float(np.linalg.norm(self.to_mono_ndarray()))

    def dot(self, other: "BlockVector") -> float:
        return float(np.dot(self.to_mono_ndarray(), other.to_mono_ndarray()))

    def __repr__(self):
        items = ", ".join(f"{k}: {v.shape}" for k, v in self.sub_items())
        return f"BlockVector({items})"


class _SubAccessor:
    """Implements the reference's ``bvec.sub[key]`` access pattern."""

    def __init__(self, bvec: BlockVector):
        self._bvec = bvec

    def __getitem__(self, key):
        return self._bvec[key]

    def __setitem__(self, key, value):
        self._bvec[key] = value


# -- Module-level functions mirroring blockarray.blockvec ------------------


def concatenate(bvecs: Sequence[BlockVector], labels=None) -> BlockVector:
    """Concatenate block vectors into one (reference: ``bv.concatenate``)."""
    vecs, keys = [], []
    for b in bvecs:
        for k, v in b.sub_items():
            if k in keys:
                raise ValueError(f"Duplicate block label '{k}' in concatenate")
            keys.append(k)
            vecs.append(v)
    if labels is not None:
        if len(labels) == 1 and isinstance(labels[0], (tuple, list)):
            keys = list(labels[0])
        else:
            keys = list(labels)
    return BlockVector(vecs, labels=[tuple(keys)])


def chunk(bvec: BlockVector, chunk_shapes: Sequence[int]):
    """
    Split a block vector into chunks of given block counts *or* sizes.

    The reference calls ``bv.chunk(state, (solid.state.size, fluid.state.size))``
    where the sizes are flat dof counts; blocks are never split across chunks
    so the split points are resolved to block boundaries.
    """
    sizes = [v.size for v in bvec.blocks]
    chunks = []
    start = 0
    for target in chunk_shapes:
        total, stop = 0, start
        while stop < len(sizes) and total < target:
            total += sizes[stop]
            stop += 1
        if total != target:
            # interpret chunk_shapes as block counts instead
            stop = start + target
        chunks.append(bvec[start:stop])
        start = stop
    return tuple(chunks)


def dot(a: BlockVector, b: BlockVector) -> float:
    return a.dot(b)


def norm(a: BlockVector) -> float:
    return a.norm()


class BlockMatrix:
    """
    A labeled 2D grid of dense numpy sub-matrices.

    Minimal stand-in for ``blockarray.blockmat.BlockMatrix`` (API inferred
    from reference call sites, SURVEY section 2.11): used by the dynamical
    models' block Jacobians and by analysis scripts, not by the hot compute
    path (which is pure pytrees).
    """

    def __init__(self, mats, shape=None, labels=None):
        # mats: nested lists [[...]] or flat list + shape
        if shape is None:
            rows = len(mats)
            cols = len(mats[0])
            grid = [list(r) for r in mats]
        else:
            rows, cols = shape
            if isinstance(mats[0], (list, tuple)):
                grid = [list(r) for r in mats]
            else:
                grid = [
                    [mats[i * cols + j] for j in range(cols)]
                    for i in range(rows)
                ]
        self._grid = [[np.asarray(m) for m in r] for r in grid]
        if labels is None:
            labels = (
                tuple(str(i) for i in range(rows)),
                tuple(str(j) for j in range(cols)),
            )
        self._row_keys = tuple(labels[0])
        self._col_keys = tuple(labels[1])

    @property
    def labels(self):
        return (self._row_keys, self._col_keys)

    @property
    def shape(self):
        return (len(self._row_keys), len(self._col_keys))

    @property
    def bshape(self):
        return (
            tuple(r[0].shape[0] for r in self._grid),
            tuple(m.shape[1] for m in self._grid[0]),
        )

    def _idx(self, keys, key):
        if isinstance(key, (int, np.integer)):
            return int(key)
        return keys.index(key)

    def __getitem__(self, key):
        i, j = key
        return self._grid[self._idx(self._row_keys, i)][
            self._idx(self._col_keys, j)
        ]

    def __setitem__(self, key, value):
        i, j = key
        self._grid[self._idx(self._row_keys, i)][
            self._idx(self._col_keys, j)
        ] = np.asarray(value)

    @property
    def sub(self):
        return self

    def to_mono_ndarray(self) -> np.ndarray:
        return np.block(self._grid)

    def mult_vec(self, bvec: BlockVector) -> BlockVector:
        out = []
        for i, rk in enumerate(self._row_keys):
            acc = None
            for j, ck in enumerate(self._col_keys):
                y = self._grid[i][j] @ np.asarray(bvec[j]).reshape(-1)
                acc = y if acc is None else acc + y
            out.append(acc)
        return BlockVector(out, labels=[self._row_keys])

    def transpose(self) -> "BlockMatrix":
        grid = [
            [self._grid[i][j].T for i in range(len(self._row_keys))]
            for j in range(len(self._col_keys))
        ]
        return BlockMatrix(grid, labels=(self._col_keys, self._row_keys))


def concatenate_mat(bmats) -> BlockMatrix:
    """Concatenate a 2D grid of BlockMatrices (reference: ``bm.concatenate``)."""
    row_keys, col_keys = [], []
    for brow in bmats:
        row_keys.extend(brow[0].labels[0])
    for b in bmats[0]:
        col_keys.extend(b.labels[1])
    grid = []
    for brow in bmats:
        for i in range(len(brow[0].labels[0])):
            row = []
            for b in brow:
                row.extend(b._grid[i])
            grid.append(row)
    return BlockMatrix(grid, labels=(tuple(row_keys), tuple(col_keys)))


def mult_mat_vec(bmat: BlockMatrix, bvec: BlockVector) -> BlockVector:
    return bmat.mult_vec(bvec)


def mult_mat_mat(a: BlockMatrix, b: BlockMatrix) -> BlockMatrix:
    rows, inner, cols = len(a.labels[0]), len(a.labels[1]), len(b.labels[1])
    grid = []
    for i in range(rows):
        row = []
        for j in range(cols):
            acc = None
            for k in range(inner):
                y = a._grid[i][k] @ b._grid[k][j]
                acc = y if acc is None else acc + y
            row.append(acc)
        grid.append(row)
    return BlockMatrix(grid, labels=(a.labels[0], b.labels[1]))
