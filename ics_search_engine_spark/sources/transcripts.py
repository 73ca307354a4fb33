"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Input schema per BASELINE.json input_hint:
    (conv_id:string, turn_idx:int32, role:string, text:string,
     tool:string, ts:timestamp)

Everything is a pure function of the seed — no wall clock, no external
data — so any scale can be regenerated bit-identically for tests,
oracle goldens, and the local[8]/local[32] scaling bench.

Properties engineered into the corpus (FIXTURES.md):
* 5,000-word vocabulary with Zipf(s=1.1) frequencies → head-term skew
  (the skew-splitting code path has real hot terms to split);
* stop words planted at the head ranks (reference keeps them at index
  time, /root/reference/todo.md:4);
* mixed case + punctuation + digits to exercise the ``[a-zA-Z0-9]+``
  tokenizer (/root/reference/utils/tokenizer.py:24-25);
* morphological suffixes so Porter stemming actually conflates forms;
* ~1% near-duplicate turns (1-2 token edits of an earlier turn) for
  SimHash dedup (/root/reference/components/document_processor.py:72-79);
* planted rare terms with known (tf, df) for hand-checkable BM25.

The generator is plain numpy (no Spark needed) and writes a single
parquet via pyarrow; at bench scales it streams row-groups so memory
stays bounded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# --- vocabulary ----------------------------------------------------------

_STEMS = [
    "spark", "index", "search", "token", "stem", "queri", "shard", "merg",
    "scal", "comput", "machin", "learn", "engin", "scienc", "softwar",
    "data", "model", "train", "agent", "tool", "code", "test", "build",
    "plan", "graph", "rank", "score", "term", "document", "posting",
    "compress", "partition", "shuffle", "broadcast", "cluster", "execut",
    "stream", "batch", "join", "filter", "group", "window", "sort",
    "research", "master", "societ", "impact", "cristina", "lopes",
    "universit", "california", "irvine", "informat", "professor",
]
_SUFFIXES = ["", "s", "ing", "ed", "er", "ation", "al", "ive", "ment"]
_CONS = "bcdfghjklmnprstvwz"
_VOWS = "aeiou"

# Head-rank stop words (kept at index time; dropped at query time).
_HEAD_STOPS = ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"]

# Planted rare terms: each appears in exactly the turns we inject it into,
# giving hand-checkable (tf, df) for BM25 unit tests.
PLANTED_RARE = ["xyzzyqux", "plughfrobozz", "quuxzorble"]

_ROLES = ["user", "assistant"]
_TOOLS = ["bash", "search", "browser", "editor", "python"]

_EPOCH_BASE = 1_700_000_000  # fixed, deterministic


def build_vocabulary(seed: int = 42) -> list[str]:
    """5,000 deterministic words: stop words at the head, then
    morphological variants of real stems, then CVCV nonsense words."""
    rng = np.random.RandomState(seed)
    vocab: list[str] = list(_HEAD_STOPS)
    for s in _STEMS:
        for suf in _SUFFIXES:
            w = s + suf
            if len(w) >= 2 and w not in vocab:
                vocab.append(w)
    while len(vocab) < 5000:
        n_syll = 2 + int(rng.randint(0, 3))
        w = "".join(
            _CONS[rng.randint(0, len(_CONS))] + _VOWS[rng.randint(0, len(_VOWS))]
            for _ in range(n_syll)
        )
        if rng.rand() < 0.1:
            w += str(rng.randint(0, 100))
        if w not in _HEAD_STOPS:
            vocab.append(w)
    # dedupe preserving order, then trim
    seen: set[str] = set()
    out = []
    for w in vocab:
        if w not in seen:
            seen.add(w)
            out.append(w)
    while len(out) < 5000:  # replenish any dedupe loss
        out.append(f"fillword{len(out)}")
    return out[:5000]


def zipf_weights(n: int, s: float = 1.1) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    w = ranks ** -s
    return w / w.sum()


def generate_turns(
    n_convs: int = 2000,
    seed: int = 42,
) -> "pa.Table":
    """Generate the corpus as a pyarrow Table (columnar, bounded memory
    for the scales used in-sandbox; see ``write_parquet`` for streaming)."""
    rng = np.random.RandomState(seed)
    vocab = np.array(build_vocabulary(seed), dtype=object)
    probs = zipf_weights(len(vocab))

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []

    recent_texts: list[str] = []  # pool for near-duplicate injection

    for ci in range(n_convs):
        conv_id = f"conv{ci:08d}"
        n_turns = 3 + int(rng.randint(0, 18))  # 3..20
        for ti in range(n_turns):
            if rng.rand() < 0.1:
                role = "tool"
                tool = _TOOLS[rng.randint(0, len(_TOOLS))]
            else:
                role = _ROLES[ti % 2]
                tool = ""

            if recent_texts and rng.rand() < 0.01:
                # near-duplicate: copy an earlier turn, edit 1-2 tokens
                base = recent_texts[rng.randint(0, len(recent_texts))]
                words = base.split(" ")
                for _ in range(1 + int(rng.randint(0, 2))):
                    if words:
                        words[rng.randint(0, len(words))] = str(
                            vocab[rng.choice(len(vocab), p=probs)]
                        )
                text = " ".join(words)
            else:
                n_words = 5 + int(rng.randint(0, 196))  # 5..200
                idx = rng.choice(len(vocab), size=n_words, p=probs)
                words = [str(w) for w in vocab[idx]]
                # mixed case + punctuation + digits to exercise tokenizer
                for j in range(len(words)):
                    r = rng.rand()
                    if r < 0.05:
                        words[j] = words[j].capitalize()
                    elif r < 0.07:
                        words[j] = words[j].upper()
                    if rng.rand() < 0.08:
                        words[j] += [",", ".", "!", "?", ";"][rng.randint(0, 5)]
                # planted rare terms with known df/tf
                if ci < len(PLANTED_RARE) * 2 and ti == 0:
                    planted = PLANTED_RARE[ci % len(PLANTED_RARE)]
                    reps = 1 + (ci // len(PLANTED_RARE))  # varying tf
                    words.extend([planted] * reps)
                text = " ".join(words)

            if len(recent_texts) < 500:
                recent_texts.append(text)

            conv_ids.append(conv_id)
            turn_idxs.append(ti)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append((_EPOCH_BASE + ci * 60 + ti) * 1_000_000)

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )


def _write_chunk(args: tuple) -> int:
    path, chunk_i, start, n, seed = args
    import os

    tbl = generate_turns(n_convs=n, seed=seed + chunk_i)
    # re-key conv ids so chunks don't collide
    if start:
        conv = [f"conv{start + int(c[4:]):08d}"
                for c in tbl.column("conv_id").to_pylist()]
        tbl = tbl.set_column(0, "conv_id", pa.array(conv, pa.string()))
    pq.write_table(
        tbl, os.path.join(path, f"part-{chunk_i:05d}.parquet"),
        row_group_size=10_000,
    )
    return tbl.num_rows


def write_parquet(path: str, n_convs: int = 2000, seed: int = 42,
                  chunk_convs: int = 1_000, n_jobs: int | None = None) -> int:
    """Write the corpus as a DIRECTORY of parquet files (one per
    conversation chunk) — the realistic many-files input shape, which
    also gives Spark parallel scan splits for free.  Chunking keeps
    generator memory bounded at bench scales and lets chunks generate
    in parallel (they are independent by construction).  Returns the
    number of turns written.

    Chunks derive their seed as ``seed + chunk_index`` — deterministic
    for a fixed (n_convs, seed, chunk_convs) triple, which all callers
    fix; ``n_jobs`` only affects wall time, never content.
    """
    import os

    os.makedirs(path, exist_ok=True)
    jobs = [
        (path, chunk_i, start, min(chunk_convs, n_convs - start), seed)
        for chunk_i, start in enumerate(range(0, n_convs, chunk_convs))
    ]
    if n_jobs is None:
        n_jobs = min(len(jobs), os.cpu_count() or 1, 16)
    if n_jobs <= 1 or len(jobs) <= 1:
        return sum(_write_chunk(j) for j in jobs)
    from multiprocessing import Pool

    with Pool(n_jobs) as pool:
        return sum(pool.map(_write_chunk, jobs))


# --- reference query set (FIXTURES.md §2) --------------------------------

REFERENCE_QUERIES: dict[str, str] = {
    # modeled on /root/reference/todo.md:45-50, re-expressed in the
    # synthetic vocabulary
    "q_single": "research",
    "q_two": "machine learning",
    "q_three": "master of computer science",
    "q_four": "master of software engineering",
    "q_name": "cristina lopes",
    "q_long": "machine learning and its impact on society",
    # adversarial cases
    "q_absent": "zzznotinthecorpus",
    "q_stopwords": "the and of to in",
    "q_repeated": "spark spark spark index",
    "q_singlechar": "a b c d",
    "q_headterm": "the spark",  # head-rank Zipf term to stress skew
    "q_planted": "xyzzyqux",
}
