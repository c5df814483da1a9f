"""Hash-sketch expression builders: MinHash, SimHash, rolling fingerprint.

All sketches are built from ``xxhash64(seed, value)`` — a built-in
Catalyst expression — so signatures are deterministic across runs,
partitionings, and cluster sizes (no Python in the row path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def seeded_hash(col: Column, seed: int) -> Column:
    """64-bit deterministic hash of ``col`` under an integer seed."""
    return F.xxhash64(F.lit(seed), col)


def minhash_signature(
    df: DataFrame, id_col: str, shingles_col: str, k: int = 16
) -> DataFrame:
    """MinHash signature per document: for each of ``k`` seeds, the min
    ``xxhash64(seed, shingle)`` over the document's shingle set.

    Implementation: one explode of the shingle array, then a single
    grouped aggregation computing all ``k`` minima at once (one shuffle
    by id, map-side partial mins — scales linearly in total shingle
    count; never k explodes).

    Returns ``id_col, sig array<bigint>(k)``.
    """
    exploded = df.select(id_col, F.explode(shingles_col).alias("_sh"))
    mins = [
        F.min(seeded_hash(F.col("_sh"), seed)).alias(f"_h{seed}")
        for seed in range(k)
    ]
    agg = exploded.groupBy(id_col).agg(*mins)
    return agg.select(
        id_col, F.array(*[F.col(f"_h{s}") for s in range(k)]).alias("sig")
    )


def lsh_bands(
    sig_df: DataFrame, id_col: str, bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """Split a minhash signature into ``bands`` bands of ``rows_per_band``
    and hash each.

    Returns exploded ``id_col, band_idx int, band_hash bigint`` — a
    candidate-bucket key. Two docs sharing any (band_idx, band_hash)
    bucket are near-dup candidates (standard LSH banding).
    """
    entries = []
    for b in range(bands):
        band_slice = F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
        entries.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.xxhash64(F.lit(b), band_slice).alias("band_hash"),
            )
        )
    return sig_df.select(
        id_col, F.explode(F.array(*entries)).alias("_band")
    ).select(id_col, "_band.band_idx", "_band.band_hash")


def simhash_signature(
    df: DataFrame, id_col: str, shingles_col: str
) -> DataFrame:
    """64-bit SimHash per document: bit j of the output is 1 iff the sum
    over shingles of ±1 (by bit j of xxhash64(shingle)) is positive.

    Implementation mirrors :func:`minhash_signature`: one explode, one
    grouped aggregation computing all 64 bit-votes as parallel sums
    (map-side combinable, single shuffle by id) — NOT a per-row fold,
    which would re-walk the shingle array 64×.

    Returns ``id_col, sim bigint``.
    """
    ex = df.select(id_col, F.explode(shingles_col).alias("_sh")).select(
        id_col, F.xxhash64(F.lit(0), F.col("_sh")).alias("_h")
    )
    votes = [
        F.sum(
            F.when(
                F.col("_h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), j)) != 0, 1
            ).otherwise(-1)
        ).alias(f"_v{j}")
        for j in range(64)
    ]
    agg = ex.groupBy(id_col).agg(*votes)
    sim = F.lit(0).cast("long")
    for j in range(64):
        sim = sim.bitwiseOR(
            F.when(
                F.col(f"_v{j}") > 0, F.shiftleft(F.lit(1).cast("long"), j)
            ).otherwise(F.lit(0).cast("long"))
        )
    return agg.select(id_col, sim.alias("sim"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit hashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def rolling_fingerprint(text: Column, base: int = 257, mod: int = (1 << 61) - 1) -> Column:
    """Polynomial rolling hash of the whole string (Rabin–Karp style),
    computed JVM-side: fold over characters of ``aggregate(split(text, ''))``.

    Deterministic document fingerprint; cheap and order-sensitive
    (unlike a bag-of-words hash).
    """
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("decimal(38,0)"),
        lambda acc, c: (acc * base + F.ascii(c)) % F.lit(mod).cast("decimal(38,0)"),
    ).cast("long")
