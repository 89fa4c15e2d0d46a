"""Substitution matrices (BLOSUM45/50/62/80/90, PAM30/70/250).

The standard public NCBI matrices, stored in the engine's alphabet order
(see oswald_tpu.alphabet) as an [24, 24] int8 table per matrix; row/column 23
is the dummy/padding residue and scores 0 against everything (matching the
reference's zero row, /root/reference/host/src/submat.c).  Values are loaded
from the committed data/submat.npz artifact.
"""

import functools
import os

import numpy as np

MATRIX_NAMES = ("blosum45", "blosum50", "blosum62", "blosum80", "blosum90",
                "pam30", "pam70", "pam250")

_DATA = os.path.join(os.path.dirname(__file__), "data", "submat.npz")


@functools.lru_cache(maxsize=None)
def _load():
    with np.load(_DATA) as z:
        return {k: z[k] for k in z.files}


def get_submat(name: str) -> np.ndarray:
    """Return the [24, 24] int8 substitution matrix for `name`.

    Raises ValueError for unknown names (the reference validates the same
    set, /root/reference/host/src/arguments.c).
    """
    key = name.lower()
    mats = _load()
    if key not in mats:
        raise ValueError(
            f"unknown substitution matrix {name!r}; "
            f"valid: {', '.join(MATRIX_NAMES)}")
    return mats[key]
