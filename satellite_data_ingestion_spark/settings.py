"""Runtime configuration: the engine's scale knobs in one env-layered module.

Mirrors the reference's settings layering (``config/__init__.py:11-15``
selects a dev/prod profile from an env var; ``config/base.py:14`` holds the
base constants): a BASE dict carries the test-scale defaults, ``SDIS_ENV``
overlays a named profile, and any single knob is overridable with
``SDIS_<NAME>`` (highest precedence).  Retuning for a real cluster is an
environment change, not a source edit.

Resolution order (later wins):  BASE  →  profile[SDIS_ENV]  →  SDIS_<NAME>.

Knobs are resolved once at import (standard env-config semantics — a
process sees one consistent configuration).  Defaults are the values every
test and oracle was pinned against; the ``prod`` profile is a documented
1000-executor starting posture, not a tested configuration.

Only SCALE knobs live here — parallelism caps, probe budgets, sketch
widths.  Constants that define query SEMANTICS (thresholds baked into both
a Spark plan and its DuckDB oracle, grid resolutions, slot widths) stay in
their operator modules: tuning those changes the answer, not the plan.
"""

from __future__ import annotations

import os

_BASE: dict[str, int] = {
    # Dedup (llm/dedup.py): exact all-pairs cap per LSH bucket before the
    # candidate generator switches to star linking; minhash sketch shape;
    # label-propagation round cap for ext_dedup_cluster.
    "MAX_BUCKET": 500,
    "MINHASH_N_HASHES": 16,
    "MINHASH_N_BANDS": 4,
    # SimHash verify gate (popcount(xor) <= H).  The quality dial of a
    # rows-only SCREEN operator, so it lives here with the other
    # recall/probe knobs (LSH_PROBE_HAMMING is the same kind of gate):
    # the measured recall/precision curve on this corpus is in
    # BASELINE.md — 10 keeps simhash a cheap precision-leaning screen
    # (recall 0.83); 14 buys +0.16 recall at ~2x the pair output.
    "SIMHASH_MAX_HAMMING": 10,
    # 20 rounds close any duplicate graph up to ~1M hops deep under
    # pointer doubling (O(log d)); the early exit makes headroom free.
    # 10 was enough at sf0.01 but the sf0.1 corpus chains ~2k docs deep
    # (caught by the round-6 bench, not the sf0.01 sweep).
    "CC_MAX_ITERS": 20,
    # Pointer doublings per CC round: distance-to-minimum shrinks ~2^d
    # per round, so total joins ~ (1+d)/d * log2(diameter) DECREASES in d
    # while the per-round plan gets d joins deeper.  3 halves the round
    # count of the round-5 d=2 posture on the sf0.1 graphs (measured);
    # past ~4 the extra join outweighs the saved rounds at bench scale.
    "CC_DOUBLINGS": 3,
    # Quotient-graph size at which CC finishes LOCALLY: once contraction
    # shrinks the edge set under this bound, one bounded collect +
    # union-find + broadcast join replaces the remaining iterative
    # rounds (the "solve on one machine when it fits" step of the
    # MapReduce-CC literature).  100k edges = ~2 MB on the driver; each
    # avoided round costs 4-5 shuffles of the full label table.
    "CC_LOCAL_EDGES": 100_000,
    # Embedding dedup (llm/simsearch.py): block-nested-loop tile factor —
    # each label's pair space splits into TILE_P^2 tasks.
    "TILE_P": 4,
    # ANN probe budgets (llm/simsearch.py).  The LSH trio was fitted by
    # offline simulation on this corpus (round 6): 64 tables x 28 sign
    # bits with per-table multiprobe hamming<=6 → recall@10 1.0/0.9/0.9
    # probing 18.8%/18.2%/18.3% at sf0.001/0.01/0.1 — the round-5
    # 32x24/h<=5 point measured 0.8 at sf0.1.  Planes must stay <= 31
    # (int32 bit-packing guard in simsearch.py).
    "LSH_N_TABLES": 64,
    "LSH_N_PLANES": 28,
    "LSH_PROBE_HAMMING": 6,
    # IVF: 128 lists / 32 probed (25% of lists) measures recall@10
    # 0.9/0.9/1.0 at sf0.001/0.01/0.1 probing ~26% of rows — replacing
    # the old 16/6 posture (0.7 recall at ~38% probed).
    "IVF_K": 128,
    "IVF_NPROBE": 32,
    "IVF_TRAIN_SAMPLE": 1024,
    "IVF_ITERS": 5,
    # IVF-PQ (llm/simsearch.py): 16 subspaces x 32 codes compresses the
    # 64-dim float corpus 32x (16-byte codes), so the probe budget can
    # be ~1.5x IVF's for far less IO; ADC keeps the top REFINE*k
    # candidates for exact re-rank (raw vectors read only for those).
    # Measured through the implementation: recall@10 table in BASELINE.md.
    "PQ_M": 16,
    "PQ_KS": 32,
    "PQ_NPROBE": 48,
    "PQ_REFINE": 20,
    # BPE trainer (llm/bpe.py): merge count and histogram cap.  The
    # histogram collect is bounded by MAX_WORDS regardless of corpus
    # size; prod raises both for a real vocabulary.
    "BPE_N_MERGES": 64,
    "BPE_MAX_WORDS": 8192,
    # Unigram-LM trainer (llm/unigram.py): final piece-vocabulary size,
    # seed-substring cap and max seed piece length.  Like BPE, the only
    # corpus-sized stage is the word histogram (same MAX_WORDS bound);
    # EM + pruning run driver-side over vocab-sized state.
    "UNIGRAM_VOCAB": 64,
    "UNIGRAM_SEED": 4096,
    "UNIGRAM_MAX_PIECE": 8,
    # Range-partition width for the driver-free global shuffle_index
    # (llm/sampling.py) and the salting fan-out for skewed keys
    # (operators/scale.py).
    "SHUFFLE_PARTITIONS": 16,
    "N_SALT": 8,
}

_PROFILES: dict[str, dict[str, int]] = {
    # dev == the tested defaults (local[32], sf<=0.1 parquet).
    "dev": {},
    # prod: documented starting points for a 1000-executor / 100 TB run.
    # Sized so per-task state stays bounded: buckets and tiles grow with
    # the data, probe budgets grow with the list count, and partition
    # counts approach 2-3x total cores.  Tune per workload via SDIS_*.
    "prod": {
        "MAX_BUCKET": 100_000,
        "CC_MAX_ITERS": 30,
        "CC_LOCAL_EDGES": 1_000_000,
        "TILE_P": 64,
        "IVF_K": 4096,
        "IVF_NPROBE": 64,
        "IVF_TRAIN_SAMPLE": 262_144,
        "IVF_ITERS": 10,
        # 256-code books (8-bit codes) once the train sample supports
        # them; probe budget scales with the larger list count.
        "PQ_KS": 256,
        "PQ_NPROBE": 512,
        "PQ_REFINE": 50,
        "BPE_N_MERGES": 32_000,
        "BPE_MAX_WORDS": 4_000_000,
        "UNIGRAM_VOCAB": 32_000,
        "UNIGRAM_SEED": 1_000_000,
        "UNIGRAM_MAX_PIECE": 16,
        "SHUFFLE_PARTITIONS": 2000,
        "N_SALT": 64,
    },
}


def _resolve() -> dict[str, int]:
    profile = os.environ.get("SDIS_ENV", "dev")
    if profile not in _PROFILES:
        raise ValueError(
            f"SDIS_ENV={profile!r}: unknown profile (have {sorted(_PROFILES)})"
        )
    merged = {**_BASE, **_PROFILES[profile]}
    # A misspelled override (SDIS_LSH_NTABLES for SDIS_LSH_N_TABLES) must
    # fail loudly, not silently run on defaults: reject any SDIS_* key
    # that is not a known knob.
    known = {f"SDIS_{name}" for name in merged} | {"SDIS_ENV"}
    unknown = sorted(k for k in os.environ if k.startswith("SDIS_") and k not in known)
    if unknown:
        raise ValueError(
            f"unrecognized settings override(s) {unknown}; known knobs: {sorted(known)}"
        )
    for name in merged:
        raw = os.environ.get(f"SDIS_{name}")
        if raw is not None:
            try:
                merged[name] = int(raw)
            except ValueError:
                raise ValueError(
                    f"SDIS_{name}={raw!r}: expected an integer"
                ) from None
    return merged


_SETTINGS = _resolve()

MAX_BUCKET: int = _SETTINGS["MAX_BUCKET"]
MINHASH_N_HASHES: int = _SETTINGS["MINHASH_N_HASHES"]
MINHASH_N_BANDS: int = _SETTINGS["MINHASH_N_BANDS"]
SIMHASH_MAX_HAMMING: int = _SETTINGS["SIMHASH_MAX_HAMMING"]
CC_MAX_ITERS: int = _SETTINGS["CC_MAX_ITERS"]
CC_DOUBLINGS: int = _SETTINGS["CC_DOUBLINGS"]
CC_LOCAL_EDGES: int = _SETTINGS["CC_LOCAL_EDGES"]
TILE_P: int = _SETTINGS["TILE_P"]
LSH_N_TABLES: int = _SETTINGS["LSH_N_TABLES"]
LSH_N_PLANES: int = _SETTINGS["LSH_N_PLANES"]
LSH_PROBE_HAMMING: int = _SETTINGS["LSH_PROBE_HAMMING"]
IVF_K: int = _SETTINGS["IVF_K"]
IVF_NPROBE: int = _SETTINGS["IVF_NPROBE"]
IVF_TRAIN_SAMPLE: int = _SETTINGS["IVF_TRAIN_SAMPLE"]
IVF_ITERS: int = _SETTINGS["IVF_ITERS"]
PQ_M: int = _SETTINGS["PQ_M"]
PQ_KS: int = _SETTINGS["PQ_KS"]
PQ_NPROBE: int = _SETTINGS["PQ_NPROBE"]
PQ_REFINE: int = _SETTINGS["PQ_REFINE"]
BPE_N_MERGES: int = _SETTINGS["BPE_N_MERGES"]
BPE_MAX_WORDS: int = _SETTINGS["BPE_MAX_WORDS"]
UNIGRAM_VOCAB: int = _SETTINGS["UNIGRAM_VOCAB"]
UNIGRAM_SEED: int = _SETTINGS["UNIGRAM_SEED"]
UNIGRAM_MAX_PIECE: int = _SETTINGS["UNIGRAM_MAX_PIECE"]
SHUFFLE_PARTITIONS: int = _SETTINGS["SHUFFLE_PARTITIONS"]
N_SALT: int = _SETTINGS["N_SALT"]
