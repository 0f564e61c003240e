"""Skew-tolerant joins (SCALE.md §Skew).

AQE's skew-join split (on in session.py) handles most hot keys by
splitting oversized sort-merge partitions at runtime. The residual case
is a hot key whose *build* side can't broadcast and whose probe side
AQE won't split (e.g. the skewed side feeds a co-partitioned downstream
stage, or the join is key-skewed beyond the split factor). The classic
remedy is salting: spread each hot probe row across ``n_salts``
sub-keys and replicate the dimension row once per sub-key, turning one
oversized task into ``n_salts`` even ones.

Deliberately a helper, not a default: at 100 TB the first choices stay
broadcast (small dim) and AQE (moderate skew); salting multiplies the
dimension side ×n_salts, which is only the right trade when one key
dominates a partition."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__argostats_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the big side salted into
    ``n_salts`` sub-keys and the small side replicated once per salt.

    Row-for-row equivalent to ``big.join(small, on, how)`` for
    ``inner``/``left`` joins (each big row carries exactly one salt, so
    it meets exactly the small rows of its key): multiplicities,
    including unmatched left rows, are preserved. ``right``/``full`` are
    rejected — unmatched small-side *replicas* would fabricate rows.

    The salt is a deterministic hash of ``salt_on`` (default: every big
    column), so retried tasks re-derive identical salts; hash-of-content
    spreads a hot key's rows across salts unless the rows are literal
    duplicates (which co-group harmlessly)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, not {how!r}")
    if _SALT in big.columns or _SALT in small.columns:
        raise ValueError(f"column name {_SALT} is reserved")
    cols = salt_on if salt_on is not None else big.columns
    salt: Column = F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))
    big_s = big.withColumn(_SALT, salt)
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, on=[*on, _SALT], how=how).drop(_SALT)
