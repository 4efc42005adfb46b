"""Portable deterministic hashing as Column expressions.

The dedup/fingerprint operators need hash functions that produce
IDENTICAL values in Spark and in the DuckDB oracle.  Spark's builtin
``hash``/``xxhash64`` are Spark-specific, so everything here derives
from MD5 hex strings, which both engines implement identically:

- Spark:  ``conv(substring(md5(x), 1, 15), 16, 10)``  -> decimal string
- DuckDB: ``CAST('0x' || substring(md5(x), 1, 15) AS BIGINT)``

15 hex chars = 60 bits, safely inside int64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(col: Column | str) -> Column:
    """Lowercase 32-char MD5 hex digest. Identical in DuckDB ``md5(x)``."""
    col = F.col(col) if isinstance(col, str) else col
    return F.md5(col.cast("string"))


def hash64(col: Column | str, seed: int | None = None) -> Column:
    """60-bit integer hash derived from MD5, optionally seeded.

    Seeding is done by prefixing ``"{seed}:"`` — portable, unlike native
    seeded hash functions.
    DuckDB: ``CAST('0x' || substring(md5(concat(seed,':',x)),1,15) AS BIGINT)``
    """
    col = F.col(col) if isinstance(col, str) else col
    keyed = col.cast("string") if seed is None else F.concat(F.lit(f"{seed}:"), col.cast("string"))
    return F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("bigint")


def minhash_signature(grams: Column, num_hashes: int) -> Column:
    """MinHash signature as an ``array<string>`` of length ``num_hashes``.

    For each hash index i, the signature element is the lexicographic min
    of ``md5(i || ':' || gram)`` over the document's shingle set — the
    standard min-wise permutation family, realized with strings so Spark
    and DuckDB agree byte-for-byte.

    Entirely PER-ROW (no shuffle): a doc's signature is computed from its
    own shingle array inside codegen.  At 100 TB this is the property you
    want — signatures cost one map stage.

    DuckDB: ``list_transform(range(0, H), i ->
               list_min(list_transform(grams, g -> md5(i || ':' || g))))``

    Empty shingle arrays produce NULL elements (min of empty set).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(grams, lambda g: F.md5(F.concat(i.cast("string"), F.lit(":"), g)))
        ),
    )
