"""Similarity / dedup primitives: cosine, MinHash, SimHash, LSH banding.

Scale design (the point of these ops at 100 TB):

- **MinHash+LSH**: signatures are computed per-document with built-in
  expressions (hash shingles -> k permuted mins), then banded; candidate
  pairs come from an equi-join on (band_id, band_hash) buckets — a shuffle
  on small keys instead of the O(n²) cross join.
- **SimHash**: 64-bit fingerprint from per-token hash bit-votes;
  near-dup = popcount(xor) <= t within LSH buckets on bit-blocks.
- **Cosine**: exact form is zip_with+aggregate (JVM); the ANN path buckets
  by random-hyperplane signs first.

``F.hash`` (Murmur3) seeds the permutations: deterministic across runs and
partitionings, so results are reproducible (required by the driver's
hash-compare), though not portable to DuckDB — MinHash/SimHash queries are
rows-only checks while n-gram Jaccard provides the SQL-checkable exact twin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PRIME = 2147483647  # 2^31 - 1, Mersenne prime for cheap permutation hashing


def shingle_hashes(shingles: Column) -> Column:
    """Murmur3 hash of each shingle, mapped to non-negative int64."""
    return F.transform(shingles, lambda s: F.pmod(F.hash(s).cast("long"), F.lit(_PRIME)))


def minhash_signature(shingles: Column, k: int = 32) -> Column:
    """k-permutation MinHash signature: min over ((a_i * h + b_i) mod p).

    One pass over the shingle array per permutation, all JVM expressions;
    a_i/b_i derive deterministically from the permutation index."""
    hashes = shingle_hashes(shingles)

    # NOTE: pyspark derives the HOF arity from the Python lambda signature,
    # so loop variables must be captured via a factory, never `i=i` defaults
    def perm(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_PRIME)

    sig = []
    for i in range(k):
        a = 2 * i + 1          # odd multiplier
        b = 1000003 * (i + 1)  # fixed offset
        sig.append(F.array_min(F.transform(hashes, perm(a, b))))
    return F.array(*sig)


def minhash_signature_agg(
    df, id_cols: list[str], shingles_col: str, k: int = 32, pre_hashed: bool = False
):
    """MinHash via explode + groupBy-min: one row per (id, shingle-hash),
    then ``min((a_i*h+b_i) mod p)`` as k flat aggregate expressions.

    Semantically identical to :func:`minhash_signature` but compiles to a
    narrow whole-stage-codegen plan instead of a k-deep nested-HOF
    expression tree — the HOF form costs seconds of JIT per stage, this
    form is the one to use in hot paths.  Returns df[id_cols + [sig]].

    With ``pre_hashed`` the column already holds int64 shingle hashes
    (e.g. a materialized hashed-shingle table) and only the mod-p fold is
    applied."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    if pre_hashed:
        hashes = F.transform(F.col(shingles_col), lambda h: F.pmod(h, F.lit(_PRIME)))
    else:
        hashes = shingle_hashes(F.col(shingles_col))
    ex = df.select(*id_cols, F.explode(hashes).alias("h"))
    aggs = []
    for i in range(k):
        a = 2 * i + 1
        b = 1000003 * (i + 1)
        aggs.append(F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(_PRIME)).alias(f"s{i}"))
    wide = ex.groupBy(*id_cols).agg(*aggs)
    return wide.select(*id_cols, F.array(*[F.col(f"s{i}") for i in range(k)]).alias("sig"))


def lsh_bands(signature: Column, bands: int, rows: int) -> Column:
    """Split a signature into ``bands`` hashes of ``rows`` values each ->
    array<struct<band:int, h:bigint>> for the bucket equi-join."""
    out = []
    for b in range(bands):
        band_slice = F.slice(signature, b * rows + 1, rows)
        out.append(
            F.struct(
                F.lit(b).alias("band"),
                F.hash(F.concat_ws("_", F.transform(band_slice, lambda x: x.cast("string")))).cast("long").alias("h"),
            )
        )
    return F.array(*out)


def lsh_band_keys(signature: Column, bands: int, rows: int) -> list[Column]:
    """Flat-expression variant of :func:`lsh_bands`: one 64-bit key Column
    per band, built from direct element access (no HOFs — cheap codegen).
    Band index is folded into the hash so keys never collide across bands."""
    keys = []
    for b in range(bands):
        elems = [signature[b * rows + r] for r in range(rows)]
        keys.append(F.hash(F.lit(b), *elems).cast("long"))
    return keys


def simhash64(token_hashes: Column, n_bits: int = 64) -> Column:
    """64-bit SimHash: for each bit, vote +1/-1 per token hash bit, take the
    sign.

    Single pass over the token-hash array: the aggregate's accumulator is an
    array of ``n_bits`` vote counters updated per token (``zip_with``
    against a bit-index sequence, ``bit_get`` takes a *column* position —
    the shift functions don't), then the finisher packs the vote signs into
    one long.  The naive form — one ``aggregate`` per bit — walks every
    document's shingle list 64 times; this walks it once.

    Packing uses ``pow(2, i)`` (exact in double for i <= 62); bit 63 packs
    only if its vote is positive, which the engine's 60-bit token hashes
    (15 hex chars) can never produce."""
    idx = F.sequence(F.lit(0), F.lit(n_bits - 1))
    votes = F.aggregate(
        token_hashes,
        F.array_repeat(F.lit(0), n_bits),
        lambda acc, h: F.zip_with(
            acc, idx, lambda c, i: c + F.when(F.bit_get(h, i) == 1, 1).otherwise(-1)
        ),
    )
    bits = F.zip_with(
        votes,
        idx,
        lambda c, i: F.when(c > 0, F.pow(F.lit(2.0), i).cast("long")).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda s, b: s.bitwiseOR(b))


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def cosine(a: Column, b: Column) -> Column:
    """Exact cosine similarity of two equal-length array<numeric> columns —
    zip_with + aggregate, sequential sum order (matches DuckDB's
    list_cosine_similarity for oracle parity)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: (x * y).cast("double")), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + (v * v).cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, v: s + (v * v).cast("double")))
    return dot / (na * nb)


def hyperplane_signs(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bits of dot(vec, plane_i)
    packed into a long.  ``planes`` is a small driver-side constant list
    (broadcast as literals into the plan)."""
    bit_terms = []
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(w)) for w in plane])
        dot = F.aggregate(
            F.zip_with(vec, lit_plane, lambda x, w: (x * w).cast("double")),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        bit_terms.append(F.when(dot >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out
