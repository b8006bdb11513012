"""Exponentially-decayed trending counts over a token stream.

The "what's trending NOW" primitive: a plain count ranks evergreen
tokens forever; an exponentially-decayed count c(t) = Σ_i 2^{-(t-t_i)/λ}
halves a mention's weight every ``half_life`` seconds, so a burst of
recent mentions outranks a large stale total.

The streaming-friendly identity: decayed counts are MERGEABLE if every
partial is expressed at a common reference time.  For a batch B and
"as-of" time T,  partial(B, T) = Σ_{i∈B} 2^{(t_i − T)/λ}  (each event
contributes its future-discounted weight), and two partials at the
same T simply ADD; re-basing a state from T to T' multiplies by
2^{(T − T')/λ}.  That makes the operator a decomposable aggregate:

- per micro-batch: one groupBy(token) sum of 2^{(t_i − T)/λ} — the
  exact shape every other rollup partial here takes;
- merge into state: rebase the old state to the new T (scalar
  multiply), add — no raw history is ever re-read;
- at any point the state IS the decayed count as of its T.

Numerics: exponents are (t_i − T)/λ ≤ 0, so weights are in (0, 1] —
no overflow; very old states decay toward 0 and can be pruned below a
floor (state size bounded by the active-token set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LN2 = 0.6931471805599453


def decayed_partial(
    tokens: DataFrame,
    as_of,
    half_life_s: float,
    token_col: str = "tok",
    ts_col: str = "ts",
) -> DataFrame:
    """(token, decayed_count as of ``as_of``) for one batch of
    (token, ts) mentions — one groupBy shuffle, map-side combined."""
    age = F.col(ts_col).cast("double") - F.lit(as_of).cast("timestamp").cast(
        "double"
    )
    w = F.exp(age / F.lit(half_life_s) * F.lit(_LN2))
    return (
        tokens.select(F.col(token_col).alias("token"), w.alias("w"))
        .groupBy("token")
        .agg(F.sum("w").alias("decayed_count"))
    )


def merge_decayed_state(
    state: DataFrame,
    state_as_of,
    partial: DataFrame,
    partial_as_of,
    half_life_s: float,
    prune_below: float = 1e-6,
) -> DataFrame:
    """Merge a batch partial into the running state, re-based to the
    partial's (newer) as-of time.  Outer union + one groupBy; tokens
    whose re-based weight fell under ``prune_below`` drop out, which
    is what keeps the state bounded by the ACTIVE token set."""
    import datetime as _dt

    def _secs(x) -> float:
        if isinstance(x, _dt.datetime):
            return x.timestamp()
        return float(x)

    rebase = 2.0 ** ((_secs(state_as_of) - _secs(partial_as_of)) / half_life_s)
    rebased = state.select(
        "token", (F.col("decayed_count") * F.lit(rebase)).alias("decayed_count")
    )
    return (
        rebased.unionByName(partial)
        .groupBy("token")
        .agg(F.sum("decayed_count").alias("decayed_count"))
        .where(F.col("decayed_count") >= prune_below)
    )


def trending_topk(state: DataFrame, k: int = 10) -> DataFrame:
    """Deterministic top-k of the decayed state (rounded rank key,
    token tie-break)."""
    return (
        state.select(
            "token", F.round("decayed_count", 6).alias("decayed_count")
        )
        .orderBy(F.desc("decayed_count"), "token")
        .limit(k)
    )
