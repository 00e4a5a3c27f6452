"""SimHash near-duplicate detection (Charikar 2002 / Manku et al. 2007).

The bit-packing step is a vectorized pandas UDF (Arrow batches — the
sanctioned slow path; a row-at-a-time Python UDF would be 10-100x worse),
everything around it is JVM built-ins.  At 100 TB: signature computation
is a narrow map; pairing uses band-prefix blocking (shuffle on 16-bit
prefix), then popcount(xor) filtering via the built-in `bit_count`.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .text import normalize_text


def _make_simhash_udf():
    """Build the simhash pandas UDF as a CLOSURE-LOCAL function.

    Nested functions (and their closure cells) are serialized BY VALUE by
    cloudpickle, so executors never need this package importable on their
    own sys.path — a module-level UDF is pickled by module reference and
    breaks on any worker whose cwd/PYTHONPATH doesn't include the repo.
    numpy/pandas/hashlib are site-package imports that exist on every
    worker, so those module globals pickle safely by reference (pandas
    must stay a module global: the pd.Series type hints are resolved
    against the function's __globals__ at UDF-registration time).
    """
    # Bounded memo (plain dict: lru_cache wrappers don't pickle by value).
    # Corpora repeat tokens heavily; the cap keeps worker memory flat on
    # 100 TB-scale vocabularies.
    bits_cache: dict = {}

    def token_bits(token: str):
        """Stable 64 bits per token (md5 prefix — engine-independent)."""
        v = bits_cache.get(token)
        if v is None:
            raw = np.frombuffer(
                hashlib.md5(token.encode("utf-8")).digest()[:8], dtype=np.uint8
            )
            v = np.unpackbits(raw, bitorder="little").astype(np.int64)
            if len(bits_cache) < (1 << 16):
                bits_cache[token] = v
        return v

    @F.pandas_udf(LongType())
    def simhash64(texts: pd.Series) -> pd.Series:
        """64-bit SimHash of whitespace tokens (expects normalized text)."""
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                out[i] = 0
                continue
            acc = np.zeros(64, dtype=np.int64)
            for tok in t.split(" "):
                acc += 2 * token_bits(tok) - 1
            sig = 0
            for b in range(64):
                if acc[b] > 0:
                    sig |= 1 << b
            # two's-complement into int64
            out[i] = sig - (1 << 64) if sig >= (1 << 63) else sig
        return pd.Series(out)

    return simhash64


def with_simhash(df: DataFrame, text_col: str = "text", out: str = "simhash") -> DataFrame:
    """Attach the 64-bit simhash of the normalized text."""
    return df.withColumn(out, _make_simhash_udf()(normalize_text(F.col(text_col))))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    prefix_bits: int = 12,
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming.

    Blocking on the top `prefix_bits` bits bounds the self-join (docs in
    different blocks can still differ by <= max_hamming — production
    would use the 4-table rotation of Manku et al.; one rotation is
    enough here and keeps the plan a single equi-join).
    """
    from pyspark import StorageLevel

    from .dedup import ensure_parallelism

    sigs = with_simhash(ensure_parallelism(df), text_col).select(F.col(id_col), F.col("simhash"))
    # both sides of the block self-join read sigs: persist so the pandas
    # UDF signature pass runs once, not twice
    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    shift = 64 - prefix_bits
    blocked = sigs.withColumn("block", F.shiftrightunsigned(F.col("simhash"), shift))
    a = blocked.select(F.col("block"), F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a"))
    b = blocked.select(F.col("block"), F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b"))
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
