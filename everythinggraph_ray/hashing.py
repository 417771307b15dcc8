"""Stable 64-bit vertex ids from urls.

The reference indexes a dense ``nodes[NB_NODES]`` array of ``uint32_t`` ids
(/root/reference/random.h:107-109); at 10^12-page scale dense ids don't
exist, so the url itself is the key and the vertex id is a *stable* hash of
the normalized url. Definition (the contract all processes must agree on):

    vid(url) = int.from_bytes(blake2b(url.encode('utf-8'), digest_size=8),
                              'little') & 0x7FFF_FFFF_FFFF_FFFF

Masked to 63 bits so the id is a non-negative ``int64`` — round-trips
through Arrow, parquet, pandas and DuckDB without unsigned headaches.

Collision probability for 2^63 ids at 10^12 keys is ~5e-8 — acceptable for
analytics; a production run would carry the url alongside the vid.
"""

from __future__ import annotations

from hashlib import blake2b

import numpy as np
import pyarrow as pa

_MASK = 0x7FFF_FFFF_FFFF_FFFF


def url_to_vid(url: str) -> int:
    """Stable 63-bit vertex id of a (normalized) url."""
    return int.from_bytes(blake2b(url.encode("utf-8"), digest_size=8).digest(), "little") & _MASK


def urls_to_vids(urls) -> np.ndarray:
    """Vectorized-ish ``url_to_vid`` over a sequence / Arrow array.

    blake2b has no numpy kernel; we hash each *unique* url once and map
    back — in web corpora the same hub urls repeat thousands of times per
    batch, so this is far cheaper than hashing every row.
    """
    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        arr = np.asarray(urls.to_pandas(), dtype=object)
    else:
        arr = np.asarray(urls, dtype=object)
    if any(x is None for x in arr):  # before np.unique: None breaks its sort
        raise ValueError(
            "urls_to_vids: null url in input — drop or fill null urls before "
            "vertex-id hashing (the vid contract is defined on strings only)"
        )
    uniq, inverse = np.unique(arr, return_inverse=True)
    hashed = np.fromiter((url_to_vid(u) for u in uniq), dtype=np.int64, count=len(uniq))
    return hashed[inverse]
