from tpu3dssf.serialization.codes import (
    morton_encode,
    hilbert_encode,
    serialization_keys,
    pack_cell_keys,
    SERIALIZATION_ORDERS,
)
from tpu3dssf.serialization.partition import (
    argsort_lex,
    inverse_permutation,
    permutation_gather,
)

__all__ = [
    "morton_encode",
    "hilbert_encode",
    "serialization_keys",
    "pack_cell_keys",
    "SERIALIZATION_ORDERS",
    "argsort_lex",
    "inverse_permutation",
    "permutation_gather",
]
