"""Generate sf1-scale documents + embeddings + events for the scale probe.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, read-only); the 100×
arguments in SCALING.md deserve at least one measured point above
sf0.1, so this synthesizes a 10× step (50,000 documents, 20,000
embeddings) with the same statistics as the shipped corpus — 31-word
vocabulary, 10–100-token uniform lengths, 5 langs (en-weighted),
20 round-robin sources, ~5% planted near-dups (single-token
perturbation) and ~0.2% exact dups, unit-norm 64-d embeddings in 10
label blocks.  Crucially, at 50k docs the 3-gram document frequencies
CROSS ``NGRAM_DF_CAP`` (=100), so the df-cap path runs for real instead
of vacuously.

Round 6 adds a 10× EVENTS table (1,000,000 rows) for the event/window
family probe.  The 10× is in HISTORY LENGTH (300 days at the shipped
arrival rate, same 5 uniform event types, 10× users), because history-
per-key is exactly the axis the bucket-sliced window rewrites address:
the old ``PARTITION BY event_type`` plan's single task grows 10× here,
while the bucketed plan's per-task work stays flat and its task count
grows 10×.  Same value distribution (2-dp, mean ≈ 50) and MICROS/NTZ
timestamp encoding as the shipped sf0.1 table.

Output goes to /tmp/mrfs_sf1 (never into the read-only testdata dir).
Deterministic: numpy PCG64 seed 42.

Round 8 adds a SCALE argument so the scale law rests on two measured
decades, not one: ``python scripts/gen_sf1.py /tmp/mrfs_sf10 10``
generates a 100× corpus (500k docs, 200k embeddings) for the
sf0.1→sf1→sf10 ratio rows in SCALING.md.  Documents/embeddings scale
with the factor; EVENTS stay at the sf1 size for scale>1 (the event/
window family's scale axis is history length, already probed at sf1 —
the sf10 probe targets the dedup/ANN/BPE families).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mrfs_sf1"
SCALE = int(sys.argv[2]) if len(sys.argv) > 2 else 1
N_DOCS = 50_000 * SCALE
N_VECS = 20_000 * SCALE
DIM = 64
N_EVENTS = 1_000_000
N_EVENT_DAYS = 300
N_USERS = 15_000
# the shipped corpus's exact 31-word vocabulary (extracted from sf0.1)
VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark "
    "stream table the value vector window"
).split()
assert len(VOCAB) == 31
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.41, 0.14, 0.15, 0.14, 0.16]
NEAR_DUP_FRAC = 0.05
EXACT_DUP_FRAC = 0.002


def main() -> None:
    rng = np.random.default_rng(42)
    texts: list[str] = []
    for i in range(N_DOCS):
        r = rng.random()
        if i > 10 and r < EXACT_DUP_FRAC:
            texts.append(texts[rng.integers(0, i)])
        elif i > 10 and r < EXACT_DUP_FRAC + NEAR_DUP_FRAC:
            base = texts[rng.integers(0, i)].split()
            base[-1] = VOCAB[rng.integers(0, len(VOCAB))]
            texts.append(" ".join(base))
        else:
            n = rng.integers(10, 101)
            texts.append(" ".join(rng.choice(VOCAB, size=n)))
    langs = rng.choice(LANGS, size=N_DOCS, p=LANG_W)
    docs = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(
                [f"src{i % 20}" for i in range(N_DOCS)], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    centers = rng.normal(size=(10, DIM))
    labels = rng.integers(0, 10, size=N_VECS)
    vecs = centers[labels] + 0.3 * rng.normal(size=(N_VECS, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    emb = pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    # 10×-history events: 300 days at the shipped sf0.1 arrival rate
    start_us = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    span_us = N_EVENT_DAYS * 86_400 * 1_000_000
    ts_us = np.sort(start_us + (rng.random(N_EVENTS) * span_us).astype(np.int64))
    etypes = np.array(["view", "click", "purchase", "signup", "error"])[
        rng.integers(0, 5, size=N_EVENTS)
    ]
    values = np.round(-50.0 * np.log(rng.random(N_EVENTS)), 2)
    events = pa.table(
        {
            "event_id": pa.array(range(N_EVENTS), pa.int64()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, N_USERS, size=N_EVENTS), pa.int64()
            ),
            "event_type": pa.array(etypes, pa.string()),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(
                [f'{{"k": {k}}}' for k in rng.integers(0, 100, size=N_EVENTS)],
                pa.string(),
            ),
        }
    )
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(docs, os.path.join(OUT, "documents.parquet"))
    pq.write_table(emb, os.path.join(OUT, "embeddings.parquet"))
    pq.write_table(events, os.path.join(OUT, "events.parquet"))
    print(
        f"wrote {N_DOCS} docs + {N_VECS} embeddings + {N_EVENTS} events to {OUT}"
    )


if __name__ == "__main__":
    main()
