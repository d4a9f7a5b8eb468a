"""Deterministic synthetic WAL/binlog generator for transcript CDC.

Emits Parquet WAL segments named by starting delivery offset
(``wal/seg-{start:012d}.parquet``), each row one I/U/D change event over
a multi-turn conversation transcript table (FIXTURES.md F2). All
randomness comes from one seeded ``numpy.random.Generator`` so the same
spec always produces byte-identical segments — no external data.

Scenario knobs (FIXTURES.md F2 fixture matrix):
  * ``dup_rate``       — events re-delivered later with the same op_seq
  * ``shuffle_window`` — bounded out-of-order delivery
  * ``schema_change_frac`` — delivery fraction after which segments gain
    the ``tool`` column and a ``tool`` role value (segments before the
    change point physically lack the column)
  * ``zipf_s``         — hot-key skew of conversation activity

This file is driver-side tooling, not an engine operator (the reference
keeps its data downloaders outside the engine too:
``tools/data_download/download_stuttgart_opendata.py:19-130``).
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .schema import EVENT_SCHEMA, EVENT_SCHEMA_V0

_EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp (us)

_VOCAB = None


def _vocab() -> np.ndarray:
    global _VOCAB
    if _VOCAB is None:
        rng = np.random.default_rng(1234)
        letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        words = []
        for _ in range(2048):
            n = rng.integers(3, 9)
            words.append("".join(rng.choice(letters, size=n)))
        _VOCAB = np.array(words)
    return _VOCAB


@dataclass(frozen=True)
class WalSpec:
    n_convs: int = 200
    mean_turns: float = 12.0
    update_frac: float = 0.35      # updates as fraction of inserts
    delete_frac: float = 0.03      # deletes as fraction of inserts
    words_per_text: int = 16
    seg_size: int = 2_000
    # small row groups so readers can split a segment across many read
    # tasks (a 200k-row single-row-group file caps read parallelism)
    row_group_size: int = 32_768
    seed: int = 42
    dup_rate: float = 0.0
    shuffle_window: int = 0
    schema_change_frac: float = 1.1  # >1 → no schema change
    zipf_s: float = 0.0              # 0 → uniform conv activity
    roles: tuple = ("system", "user", "assistant")
    # fraction of events made INVALID (half unknown op code, half null
    # conv_id) — feeds the dead-letter/quarantine path; 0 → all valid
    invalid_rate: float = 0.0

    def key(self) -> str:
        """Stable cache key for on-disk reuse."""
        return (
            f"c{self.n_convs}_t{self.mean_turns}_u{self.update_frac}_d{self.delete_frac}"
            f"_w{self.words_per_text}_g{self.seg_size}_s{self.seed}_p{self.dup_rate}"
            f"_o{self.shuffle_window}_sc{self.schema_change_frac}_z{self.zipf_s}"
            f"_r{self.row_group_size}"
            + (f"_i{self.invalid_rate}" if self.invalid_rate else "")
            # appended only for non-default roles so every cache key
            # ever minted stays valid
            + (
                "_R" + "-".join(self.roles)
                if self.roles != ("system", "user", "assistant")
                else ""
            )
        )


def _texts(rng: np.random.Generator, n: int, words_per_text: int) -> "pa.Array":
    """n random texts via Arrow's elementwise join kernel (C speed)."""
    import pyarrow.compute as pc

    vocab = _vocab()
    idx = rng.integers(0, len(vocab), size=(n, words_per_text))
    cols = [pa.array(vocab[idx[:, i]]) for i in range(words_per_text)]
    return pc.binary_join_element_wise(*cols, " ")


def generate_events(spec: WalSpec, conv_base: int = 0) -> pa.Table:
    """Generation-order event table (op_seq == position, monotone ts).
    ``conv_base`` offsets conversation ids so chunked generation
    (write_wal_chunked) produces disjoint key spaces."""
    rng = np.random.default_rng(spec.seed)
    turns = 1 + rng.geometric(1.0 / max(spec.mean_turns - 1, 1.0), size=spec.n_convs)
    conv_ids = np.array([f"conv_{conv_base + i:07d}" for i in range(spec.n_convs)])

    # --- inserts: one per (conv, turn), interleaved round-robin so
    # conversations grow over time like a live system.
    ins_conv = np.repeat(np.arange(spec.n_convs), turns)
    ins_turn = np.concatenate([np.arange(t) for t in turns]).astype(np.int64)
    order = np.lexsort((ins_conv, ins_turn))  # round-robin by turn depth
    ins_conv, ins_turn = ins_conv[order], ins_turn[order]
    n_ins = len(ins_conv)

    # --- updates/deletes target existing keys; hot-key skew via Zipf
    # over conversations (reference leaves skew unhandled — we model it
    # explicitly per SURVEY §4).
    if spec.zipf_s > 0:
        w = 1.0 / np.power(np.arange(1, spec.n_convs + 1, dtype=np.float64), spec.zipf_s)
        w /= w.sum()
    else:
        w = np.full(spec.n_convs, 1.0 / spec.n_convs)

    n_upd = int(n_ins * spec.update_frac)
    n_del = int(n_ins * spec.delete_frac)
    upd_conv = rng.choice(spec.n_convs, size=n_upd, p=w)
    upd_turn = (rng.random(n_upd) * turns[upd_conv]).astype(np.int64)
    del_conv = rng.choice(spec.n_convs, size=n_del, p=w)
    del_turn = (rng.random(n_del) * turns[del_conv]).astype(np.int64)

    op = np.concatenate(
        [
            np.full(n_ins, "I"),
            np.full(n_upd, "U"),
            np.full(n_del, "D"),
        ]
    )
    conv = np.concatenate([ins_conv, upd_conv, del_conv])
    turn = np.concatenate([ins_turn, upd_turn, del_turn])

    # interleave updates/deletes among the inserts: inserts keep their
    # round-robin position, mutations land uniformly past the first
    # quarter of the insert range, then argsort. NOTE: this does NOT
    # guarantee a mutation lands after ITS OWN key's insert — a U/D
    # placed before its I has a smaller (ts, op_seq) and loses LWW
    # (or, for D-before-I, the later insert wins), so the EFFECTIVE
    # update/delete mix is somewhat below update_frac/delete_frac.
    # That is a property of the fixture both the engine and the oracle
    # share (load-bearing: WAL caches and all recorded bench numbers
    # key off this layout — do not change placement casually).
    pos = np.empty(len(op), dtype=np.float64)
    pos[:n_ins] = np.arange(n_ins)
    pos[n_ins:] = rng.random(n_upd + n_del) * len(op) + n_ins * 0.25
    order = np.argsort(pos, kind="stable")
    op, conv, turn = op[order], conv[order], turn[order]

    n = len(op)
    op_seq = np.arange(n, dtype=np.int64)
    ts = _EPOCH_US + op_seq * 1_000_000 + rng.integers(0, 1000, size=n)

    role_cycle = np.array(spec.roles)
    role = role_cycle[(turn % (len(role_cycle) - 1) + 1).astype(np.int64)]
    role[turn == 0] = spec.roles[0]  # turn 0 is the system prompt

    # schema change: events after the change offset may carry tool calls;
    # frac > 1 → no evolution, full schema from the first segment.
    change_at = int(n * spec.schema_change_frac) if spec.schema_change_frac <= 1 else 0
    tool = np.full(n, None, dtype=object)
    post = np.arange(n) >= change_at
    is_assistant = role == "assistant"
    tool_mask = post & is_assistant & (rng.random(n) < 0.3)
    tool_names = np.array(["search", "code", "browse", "calc"])
    tool[tool_mask] = tool_names[rng.integers(0, len(tool_names), size=int(tool_mask.sum()))]
    role[post & (rng.random(n) < 0.05) & (turn > 0)] = "tool"

    import pyarrow.compute as pc

    rev_tag = np.where(op == "U", "rev", "orig")
    base_texts = _texts(rng, n, spec.words_per_text)
    text = pc.binary_join_element_wise(
        pa.array(conv_ids[conv]),
        "turn",
        pc.cast(pa.array(turn), pa.string()),
        pa.array(rev_tag),
        "seq",
        pc.cast(pa.array(op_seq), pa.string()),
        base_texts,
        " ",
    )
    is_del = op == "D"
    text = pc.if_else(pa.array(is_del), pa.scalar(None, type=pa.string()), text)
    role = role.astype(object)
    role[is_del] = None
    tool[is_del] = None

    cid_col = conv_ids[conv].astype(object)
    if spec.invalid_rate > 0:
        # malformed change events a real binlog tail encounters: an
        # unknown op code, or a row whose merge key is null. Drawn from
        # an independent stream so the valid-event mix is unchanged.
        rng_bad = np.random.default_rng(spec.seed + 7)
        bad_idx = np.flatnonzero(rng_bad.random(n) < spec.invalid_rate)
        op = op.astype(object)
        op[bad_idx[::2]] = "X"
        cid_col[bad_idx[1::2]] = None

    return pa.table(
        {
            "op": pa.array(op, type=pa.string()),
            "op_seq": pa.array(op_seq, type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "conv_id": pa.array(cid_col, type=pa.string()),
            "turn_idx": pa.array(turn, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pc.cast(text, pa.large_string()),
            "tool": pa.array(tool, type=pa.string()),
        },
        schema=EVENT_SCHEMA,
    )


def delivery_order(spec: WalSpec, n: int) -> np.ndarray:
    """Indices into the generation-order table, in delivery order —
    applies duplication then bounded-window shuffling."""
    rng = np.random.default_rng(spec.seed + 1)
    idx = np.arange(n, dtype=np.int64)
    if spec.dup_rate > 0:
        dup = idx[rng.random(n) < spec.dup_rate]
        # duplicates re-delivered a short while later
        dup_pos = np.minimum(dup + rng.integers(1, 500, size=len(dup)), n * 2)
        pos = np.concatenate([idx.astype(np.float64), dup_pos + rng.random(len(dup))])
        idx = np.concatenate([idx, dup])
        order = np.argsort(pos, kind="stable")
        idx = idx[order]
    if spec.shuffle_window > 1:
        jitter = rng.random(len(idx)) * spec.shuffle_window
        order = np.argsort(np.arange(len(idx)) + jitter, kind="stable")
        idx = idx[order]
    return idx



def _mark_complete(wal_dir: Path, paths: list, tag: int = 0) -> None:
    """Completeness marker: a generator killed mid-write leaves
    segments WITHOUT the marker, so the resume cache regenerates
    instead of silently benchmarking a truncated/torn stream."""
    import json

    (Path(wal_dir) / f"_complete-{tag:06d}.json").write_text(
        json.dumps({"n_segments": len(paths)})
    )


def _cache_valid(wal_dir: Path, segs: list, tag: int = 0) -> bool:
    import json

    m = Path(wal_dir) / f"_complete-{tag:06d}.json"
    if not m.exists():
        return False
    try:
        return json.loads(m.read_text()).get("n_segments") == len(segs)
    except (OSError, ValueError):
        return False


def write_wal(spec: WalSpec, wal_dir: str | Path, overwrite: bool = False) -> list[Path]:
    """Write WAL segments; returns segment paths in offset order.

    Segments whose starting delivery offset precedes the schema-change
    point are written WITHOUT the ``tool`` column (EVENT_SCHEMA_V0) —
    the physical schema-evolution case the engine must reconcile.
    """
    wal_dir = Path(wal_dir)
    if wal_dir.exists():
        segs = sorted(wal_dir.glob("seg-*.parquet"))
        if not overwrite and segs and _cache_valid(wal_dir, segs):
            return segs
        shutil.rmtree(wal_dir)
    wal_dir.mkdir(parents=True)

    events = generate_events(spec)
    order = delivery_order(spec, events.num_rows)
    delivered = events.take(pa.array(order))
    n = delivered.num_rows
    change_at = (
        int(events.num_rows * spec.schema_change_frac)
        if spec.schema_change_frac <= 1
        else 0
    )

    paths = []
    for start in range(0, n, spec.seg_size):
        seg = delivered.slice(start, spec.seg_size)
        # a segment is pre-change iff every delivered op_seq < change_at
        max_seq = pa.compute.max(seg["op_seq"]).as_py()
        if max_seq is not None and max_seq < change_at:
            seg = seg.drop_columns(["tool"]).cast(EVENT_SCHEMA_V0)
        p = wal_dir / f"seg-{start:012d}.parquet"
        pq.write_table(seg, p, row_group_size=spec.row_group_size)
        paths.append(p)
    _mark_complete(wal_dir, paths)
    return paths


def write_wal_chunked(
    spec: WalSpec,
    wal_dir: str | Path,
    chunk_convs: int = 400_000,
    overwrite: bool = False,
) -> list[Path]:
    """Streaming variant of ``write_wal`` for inputs too big to
    materialize (the monolithic path holds the full event table plus a
    re-ordered copy in RAM — ~100 GB at 10^8 events). Conversations are
    partitioned into chunks of ``chunk_convs``; each chunk is generated
    with its own derived seed and a disjoint conv-id / op_seq / ts
    range, perturbed (dups + bounded shuffle) independently, and
    flushed before the next chunk is built, so peak memory is one
    chunk. The stream differs from the monolithic generator for the
    same spec (cross-chunk interleaving and the schema-change point are
    per-chunk), but carries the same scenario semantics — the engine
    reconciles every schema transition it meets."""
    from dataclasses import replace

    wal_dir = Path(wal_dir)
    if wal_dir.exists():
        segs = sorted(wal_dir.glob("seg-*.parquet"))
        if not overwrite and segs and _cache_valid(wal_dir, segs):
            return segs
        shutil.rmtree(wal_dir)
    wal_dir.mkdir(parents=True)

    paths: list[Path] = []
    row_base = 0
    seq_base = 0
    conv_base = 0
    remaining = spec.n_convs
    ci = 0
    while remaining > 0:
        sub = replace(
            spec, n_convs=min(chunk_convs, remaining), seed=spec.seed + 7919 * ci
        )
        events = generate_events(sub, conv_base=conv_base)
        m = events.num_rows
        order = delivery_order(sub, m)
        delivered = events.take(pa.array(order))
        del events
        if seq_base:
            import pyarrow.compute as pc

            delivered = delivered.set_column(
                delivered.schema.get_field_index("op_seq"),
                "op_seq",
                pc.add(delivered["op_seq"], pa.scalar(seq_base, pa.int64())),
            )
            delivered = delivered.set_column(
                delivered.schema.get_field_index("ts"),
                "ts",
                pc.add(
                    delivered["ts"].cast(pa.int64()),
                    pa.scalar(seq_base * 1_000_000, pa.int64()),
                ).cast(pa.timestamp("us")),
            )
        n = delivered.num_rows
        change_at = (
            seq_base + int(m * sub.schema_change_frac)
            if sub.schema_change_frac <= 1
            else 0
        )
        for start in range(0, n, spec.seg_size):
            seg = delivered.slice(start, spec.seg_size)
            max_seq = pa.compute.max(seg["op_seq"]).as_py()
            if max_seq is not None and max_seq < change_at:
                seg = seg.drop_columns(["tool"]).cast(EVENT_SCHEMA_V0)
            p = wal_dir / f"seg-{row_base + start:012d}.parquet"
            pq.write_table(seg, p, row_group_size=spec.row_group_size)
            paths.append(p)
        row_base += n
        seq_base += m
        conv_base += sub.n_convs
        remaining -= sub.n_convs
        ci += 1
    _mark_complete(wal_dir, paths)
    return paths


def _chunk_task(
    sub_spec: WalSpec,
    conv_base: int,
    row_base: int,
    seq_base: int,
    stride: int,
    seg_size: int,
    wal_dir: str,
) -> list[str]:
    """Generate + perturb + write ONE chunk's segments (runs inside a
    Ray task). Mirrors ``write_wal_chunked``'s per-chunk arithmetic
    exactly, except the op_seq/ts/offset bases are FIXED multiples of
    ``stride`` instead of running sums — that is what removes the
    sequential dependency between chunks. Chunk key spaces are disjoint
    (``conv_base``), so LWW semantics never compare values across
    chunks and the fixed bases are cosmetic (monotone-ish ts, unique
    op_seq per conv)."""
    import pyarrow.compute as pc

    events = generate_events(sub_spec, conv_base=conv_base)
    m = events.num_rows
    order = delivery_order(sub_spec, m)
    # segment names span DELIVERED rows (events + dup re-deliveries)
    if len(order) >= stride:
        raise ValueError(
            f"chunk produced {len(order)} delivered rows >= stride "
            f"{stride}; raise the stride (rows per conv exceeded the "
            "statistical safety bound)"
        )
    delivered = events.take(pa.array(order))
    del events
    if seq_base:
        delivered = delivered.set_column(
            delivered.schema.get_field_index("op_seq"),
            "op_seq",
            pc.add(delivered["op_seq"], pa.scalar(seq_base, pa.int64())),
        )
        delivered = delivered.set_column(
            delivered.schema.get_field_index("ts"),
            "ts",
            pc.add(
                delivered["ts"].cast(pa.int64()),
                pa.scalar(seq_base * 1_000_000, pa.int64()),
            ).cast(pa.timestamp("us")),
        )
    n = delivered.num_rows
    change_at = (
        seq_base + int(m * sub_spec.schema_change_frac)
        if sub_spec.schema_change_frac <= 1
        else 0
    )
    paths = []
    for start in range(0, n, seg_size):
        seg = delivered.slice(start, seg_size)
        max_seq = pa.compute.max(seg["op_seq"]).as_py()
        if max_seq is not None and max_seq < change_at:
            seg = seg.drop_columns(["tool"]).cast(EVENT_SCHEMA_V0)
        p = Path(wal_dir) / f"seg-{row_base + start:012d}.parquet"
        pq.write_table(seg, p, row_group_size=sub_spec.row_group_size)
        paths.append(str(p))
    return paths


def write_wal_parallel(
    spec: WalSpec,
    wal_dir: str | Path,
    chunk_convs: int = 400_000,
    overwrite: bool = False,
    task_cpus: int = 4,
    chunk_base: int = 0,
) -> list[Path]:
    """Parallel variant of ``write_wal_chunked``: each conversation
    chunk is generated by an independent Ray task (generation is
    single-threaded numpy/Arrow, so the sequential chunked path is
    driver-bound — ~30k events/s; this one scales with cluster CPUs,
    which is the only way to materialize a 10^10-event test WAL in
    reasonable time).

    Stream layout differs from ``write_wal_chunked`` only in the
    offset bases: segment names / op_seq / ts advance by a FIXED
    per-chunk stride (``chunk_convs * 64`` — a statistical upper bound
    on events per chunk, asserted per task) instead of exact running
    sums, so chunk ci's bases are known without generating chunks
    < ci. Segment names are sparse but stay sorted in chunk order;
    the replay engine treats names as opaque ordered offsets, and each
    chunk's conv ids are disjoint, so final lake state for the same
    spec is identical to what the same stream would produce delivered
    in any order (LWW). Deterministic: same spec + chunk_convs →
    byte-identical segments, regardless of task scheduling.

    ``task_cpus`` throttles concurrency (each in-flight chunk holds
    ~2 copies of its ~1 GB event table in task heap).

    ``chunk_base`` offsets the chunk index: wave-style callers that
    generate one bounded WAL slice at a time (generate → replay → GC,
    so a 10^9+ stream never co-resides on disk) pass the number of
    chunks already emitted, giving every wave a disjoint conv-id /
    op_seq / segment-name space in ONE logical stream.
    """
    import ray

    from dataclasses import replace

    # statistical upper bound on delivered rows per chunk: ~3.5x the
    # per-conv mean (generous vs the geometric turn tail + dup
    # re-deliveries, which concentrate hard at chunk sizes >= 100
    # convs), floored at the historical 64x so every spec used to date
    # (mu <= 18.3) keeps its exact segment names and cached streams
    # stay byte-identical. _chunk_task asserts the bound held.
    mu = (
        spec.mean_turns
        * (1.0 + spec.update_frac + spec.delete_frac)
        * (1.0 + spec.dup_rate)
    )
    stride = chunk_convs * max(64, int(3.5 * mu))

    wal_dir = Path(wal_dir)
    n_chunks = -(-spec.n_convs // chunk_convs)
    lo, hi = chunk_base * stride, (chunk_base + n_chunks) * stride
    if wal_dir.exists():
        existing = sorted(wal_dir.glob("seg-*.parquet"))
        if not overwrite and existing:
            # the resume cache must belong to THIS wave: a wave-style
            # caller that crashed between replay and GC would otherwise
            # get the PREVIOUS wave's segments back and silently never
            # generate the requested slice of the stream
            from .manifest import segment_offset

            offs = [segment_offset(p) for p in existing]
            if min(offs) < lo or max(offs) >= hi:
                raise ValueError(
                    f"{wal_dir} holds segments at offsets "
                    f"[{min(offs)}, {max(offs)}] outside this call's range "
                    f"[{lo}, {hi}) (chunk_base={chunk_base}); GC the old "
                    "wave's committed segments first or pass overwrite=True"
                )
            if _cache_valid(wal_dir, existing, chunk_base):
                return existing
            # this wave's own crashed/partial generation (no marker):
            # nothing of it was ever returned to the caller, so nothing
            # was replayed — safe to regenerate from scratch
        shutil.rmtree(wal_dir)
    wal_dir.mkdir(parents=True)
    task = ray.remote(num_cpus=task_cpus)(_chunk_task)
    refs = []
    ci = chunk_base
    remaining = spec.n_convs
    while remaining > 0:
        sub = replace(
            spec, n_convs=min(chunk_convs, remaining), seed=spec.seed + 7919 * ci
        )
        refs.append(
            task.remote(
                sub, ci * chunk_convs, ci * stride, ci * stride,
                stride, spec.seg_size, str(wal_dir),
            )
        )
        remaining -= sub.n_convs
        ci += 1
    paths: list[Path] = []
    for r in refs:
        paths.extend(Path(p) for p in ray.get(r))
    paths = sorted(paths)
    _mark_complete(wal_dir, paths, chunk_base)
    return paths
