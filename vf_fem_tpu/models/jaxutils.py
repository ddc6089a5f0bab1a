"""
dict <-> BlockVector glue (reference: ``src/femvf/models/jaxutils.py``).
"""

from __future__ import annotations

import numpy as np

from .. import blocks as bv


def blockvec_to_dict(bvec: bv.BlockVector) -> dict:
    """(reference: ``jaxutils.py:9-14``)"""
    return {k: np.asarray(v) for k, v in bvec.sub_items()}


def dict_to_blockvec(d: dict) -> bv.BlockVector:
    return bv.BlockVector.from_dict(d)


def flatten_nested_dict(nested: dict, labels=None):
    """
    Flatten a nested dict (e.g. jacfwd output {row: {col: mat}}) into a flat
    list + shape (reference: ``jaxutils.py:17-28``).
    """
    if labels is None:
        row_keys = list(nested.keys())
        col_keys = list(next(iter(nested.values())).keys()) if isinstance(
            next(iter(nested.values())), dict
        ) else None
    else:
        row_keys = list(labels[0])
        col_keys = list(labels[1]) if len(labels) > 1 else None

    if col_keys is None:
        flat = [np.asarray(nested[r]) for r in row_keys]
        return flat, (len(row_keys),)
    flat = [np.asarray(nested[r][c]) for r in row_keys for c in col_keys]
    return flat, (len(row_keys), len(col_keys))
