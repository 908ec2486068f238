from .keys import canonical_md5_key, strict_parity_md5_key
from .hashing import hash64, minhash_signature
from .geo import geo_index_udf

__all__ = [
    "canonical_md5_key",
    "strict_parity_md5_key",
    "hash64",
    "minhash_signature",
    "geo_index_udf",
]
