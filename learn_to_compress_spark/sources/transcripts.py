"""Deterministic synthetic multi-turn transcript table (FIXTURES.md §1).

Schema = BASELINE.json ``input_hint``:
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)``. Seeded per conversation (seed 42 convention, matching the
reference's generators ``scripts/gen_norm.py:7`` / ``scripts/gen_bitmap.py:8``),
so any slice regenerates identically — tests, bench and the two-parallelism
scaling runs all see the same rows.

Generation is itself distributed: ``spark.range(n_convs)`` → one pandas
kernel per id-range generates that conversation's turns, so a 10^12-turn
table never converges on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ROLES = np.array(["system", "user", "assistant", "tool"])
TOOLS = np.array(
    ["search", "browser", "python", "bash", "calculator", "weather",
     "calendar", "email", "files", "db_query", "translate", "image_gen"]
)
_VOCAB = np.array(
    [w for w in (
        "the of and to a in that is was he for it with as his on be at by i "
        "this had not are but from or have an they which one you were her all "
        "she there would their we him been has when who will more no if out so "
        "said what up its about into than them can only other new some could "
        "time these two may then do first any my now such like our over man me "
        "assistant tool_call function args result error status ok retry token "
        "model prompt response stream json xml code python data query table "
        "index search browse click scroll type read write file open close run"
    ).split()]
)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

EPOCH_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z


def conv_turns(conv_i: int) -> pd.DataFrame:
    """All turns of conversation ``conv_i`` (pure function of the id)."""
    rng = np.random.default_rng(42 + conv_i)
    # Zipf-ish length, clipped to [1, 400]: a few conversations are very long
    n = int(np.clip(rng.zipf(1.3), 1, 400))
    turn = np.arange(n, dtype=np.int32)
    # role: P(repeat)=0.55 run structure
    role_idx = np.empty(n, dtype=np.int64)
    role_idx[0] = rng.integers(len(ROLES))
    repeat = rng.random(n) < 0.55
    fresh = rng.integers(0, len(ROLES), size=n)
    for k in range(1, n):
        role_idx[k] = role_idx[k - 1] if repeat[k] else fresh[k]
    # text: 1-600 tokens, lognormal length
    n_tok = np.clip(rng.lognormal(3.0, 1.0, size=n).astype(np.int64), 1, 600)
    toks = rng.integers(0, len(_VOCAB), size=int(n_tok.sum()))
    bounds = np.cumsum(n_tok)[:-1]
    texts = [" ".join(w) for w in np.split(_VOCAB[toks], bounds)]
    # tool: null 85%
    tool = np.where(
        rng.random(n) < 0.15, TOOLS[rng.integers(0, len(TOOLS), size=n)], None
    )
    # ts: per-conv start + Poisson(20s) gaps with occasional 1h jumps
    start = EPOCH_US + (hash_u64(conv_i) % 10_000_000) * 1_000_000
    gaps = rng.poisson(20_000_000, size=n).astype(np.int64)
    gaps += np.where(rng.random(n) < 0.01, 3_600_000_000, 0)
    ts = (start + np.cumsum(gaps)).astype("datetime64[us]")
    return pd.DataFrame(
        {
            "conv_id": f"conv-{conv_i:010d}",
            "turn_idx": turn,
            "role": ROLES[role_idx],
            "text": texts,
            "tool": tool,
            "ts": ts,
        }
    )


def hash_u64(x: int) -> int:
    # splitmix64 finalizer — deterministic conv start offsets
    z = (x + 0x9E3779B97F4A7C15) & (1 << 64) - 1
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & (1 << 64) - 1
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & (1 << 64) - 1
    return z ^ (z >> 31)


def transcripts_df(spark: SparkSession, n_convs: int, parallelism: int | None = None) -> DataFrame:
    """Distributed deterministic transcript table with ~3.5 turns/conv avg
    (Zipf tail to 400)."""
    ids = spark.range(0, n_convs, 1, parallelism or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            frames = [conv_turns(int(i)) for i in pdf["id"]]
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return ids.mapInPandas(gen, SCHEMA)


def transcripts_pdf(n_convs: int) -> pd.DataFrame:
    """Driver-side variant for small unit tests."""
    return pd.concat([conv_turns(i) for i in range(n_convs)], ignore_index=True)
