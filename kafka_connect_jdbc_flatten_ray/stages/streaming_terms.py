"""Incremental (epoch-at-a-time) grouped term counts with lake-resident
counted-multiset state, and the top-k read over them.

Batch ``top_terms_per_lang`` (pipelines/relational.py) rescans the whole
corpus per run; a streaming ingest should fold ONLY the new epoch's
documents into counts it already holds:

    term_state/bucket=N/epoch-M.parquet  one row per distinct
                                         (lang, token): gh int64 (the
                                         routing hash), lang, token,
                                         count
    term_state/manifest.json             buckets -> current state file,
                                         epochs -> lineage

``term_counts_epoch`` pre-aggregates each epoch batch to (lang, token,
count) partials BEFORE the shuffle (the per-batch combiner), routes rows
by ``stable_row_hash(lang, token) % N`` (the engine's hash_version-2
bucket hash — deterministic across processes, so every epoch's fold and
every reshard probe the same file for a given term), and one fold task
per touched bucket streams that bucket's prior state. The in-fold merge
groups on the REAL (lang, token) columns, so a routing-hash collision
can never merge two different terms. Addition is commutative and
associative: epochs fold in any order, and ``top_terms_from_state``
equals batch ``top_terms_per_lang`` on the union of all folded epochs —
it shares that query's SQL oracle verbatim.

State size is bounded by the number of DISTINCT (group, term) pairs
(Heaps'-law sublinear in corpus size), each row ~30 bytes of bucketed
lake state that no task ever materializes in full.

Reference parity: the reference engine has no term-count analogue; this
is the builder's-brief LLM-data-pipeline surface — the streaming
counterpart to ``top_terms_per_lang`` exactly as ``value_counts_epoch``
is to ``value_quantiles``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kafka_connect_jdbc_flatten_ray.functions.hashing import stable_row_hash
from kafka_connect_jdbc_flatten_ray.state import fs as fsx
from kafka_connect_jdbc_flatten_ray.state.manifest import TableManifest
from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
    _guard_fold,
    _split_prior_state,
    _stored_num_buckets,
)
from kafka_connect_jdbc_flatten_ray.util import read_parquet_clean

STATE_TABLE = "term_state"

_ST_SCHEMA = pa.schema([
    ("gh", pa.int64()),
    ("lang", pa.string()),
    ("token", pa.string()),
    ("count", pa.int64()),
])


def _term_count_partial(t: pa.Table, group: str, text: str) -> pa.Table:
    """Per-batch combiner: whitespace-token counts per (group, token) —
    the shuffle then moves at most one row per distinct term per batch."""
    txt = t.column(text)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    toks = pc.split_pattern(txt, " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    g = t.column(group).to_numpy(zero_copy_only=False)
    rep = pa.table({"lang": pa.array(np.repeat(g, lens)),
                    "token": pc.list_flatten(toks)})
    agg = pa.TableGroupBy(rep, ["lang", "token"]).aggregate([("token", "count")])
    agg = agg.rename_columns(["lang", "token", "count"])
    gh = stable_row_hash(agg, ("lang", "token")).view(np.int64)
    return pa.table({
        "gh": pa.array(gh),
        "lang": agg.column("lang"),
        "token": agg.column("token"),
        "count": pc.cast(agg.column("count"), pa.int64()),
    })


def term_counts_epoch(
    docs: ray.data.Dataset,
    state_root: str,
    group: str = "lang",
    text: str = "text",
    num_buckets: int = 32,
) -> dict:
    """Fold one epoch of documents into the lake-resident term counts.
    Distributed: only (gh, lang, token, count) partials shuffle (never
    document text), one fold task per touched bucket, prior state
    streamed, commit is a CAS-claimed manifest swap."""
    from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
        MAX_FOLD_ROWS,
    )

    manifest = TableManifest(state_root, STATE_TABLE)
    m = manifest.load()
    epoch = 0 if not m else int(m["epoch"]) + 1
    num_buckets = _stored_num_buckets(m, num_buckets)
    prior = {int(b): p for b, p in (m or {}).get("buckets", {}).items()}
    fs, root = fsx.resolve(state_root)
    fold_limit = MAX_FOLD_ROWS

    def _bucket(t: pa.Table) -> pa.Table:
        gh = t.column("gh").to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "__bucket", pa.array((gh % np.uint64(num_buckets)).astype(np.int32))
        )

    def _fold(g: pa.Table) -> pa.Table:
        bucket = int(g.column("__bucket")[0].as_py())
        g = g.drop_columns(["__bucket"])
        _guard_fold(g.num_rows, "term_counts_epoch", num_buckets, fold_limit)
        out_dir = fsx.join(root, STATE_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        state_path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, state_path)
        touched = np.unique(g.column("gh").to_numpy(zero_copy_only=False))
        state, writer, carried = _split_prior_state(
            fs, prior.get(bucket), "gh", touched, _ST_SCHEMA, staged
        )
        stored_rows = 0
        if state is not None and state.num_rows:
            both = pa.concat_tables([state.select(_ST_SCHEMA.names),
                                     g.select(_ST_SCHEMA.names)])
            stored_rows = state.num_rows
        else:
            both = g.select(_ST_SCHEMA.names)
        # merge on the REAL columns (gh only routes; collisions must not
        # merge distinct terms), summing stored + epoch multiplicities
        agg = pa.TableGroupBy(both, ["gh", "lang", "token"]).aggregate(
            [("count", "sum")]
        ).rename_columns(["gh", "lang", "token", "count"])
        out = pa.table({
            "gh": agg.column("gh"),
            "lang": agg.column("lang"),
            "token": agg.column("token"),
            "count": pc.cast(agg.column("count"), pa.int64()),
        })
        writer.write_table(out.cast(_ST_SCHEMA))
        writer.close()
        fsx.publish_file(fs, staged, state_path)
        return pa.table({
            "bucket": [bucket],
            "state_path": [state_path],
            "terms": [out.num_rows + carried],
            "new_terms": [out.num_rows - stored_rows],
            "epoch_tokens": [int(pc.sum(g.column("count")).as_py())],
        })

    _fold.__name__ = "term_fold"
    nonce = manifest.claim_epoch(epoch)
    try:
        stats = (
            docs.map_batches(lambda t: _term_count_partial(t, group, text),
                             batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(_bucket, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_fold, batch_format="pyarrow")
            .take_all()
        )
    except Exception:
        manifest.abandon_epoch(epoch)
        raise
    bucket_files = {int(r["bucket"]): r["state_path"] for r in stats}
    totals = {k: int(sum(r[k] for r in stats))
              for k in ("terms", "new_terms", "epoch_tokens")}
    manifest.publish(
        epoch, bucket_files, totals,
        partitioning={"num_buckets": num_buckets, "key_pk_cols": ["gh"],
                      "hash_version": 2, "group": group},
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "buckets": len(bucket_files), **totals}


def read_term_counts(state_root: str) -> ray.data.Dataset:
    """Exact (lang, token, count) totals over every epoch folded so far
    — one row per distinct term (a term lives in exactly one bucket)."""
    manifest = TableManifest(state_root, STATE_TABLE)
    fs, _ = fsx.resolve(state_root)
    files = sorted(manifest.current_files().values())
    return read_parquet_clean(
        files, filesystem=fs, columns=["lang", "token", "count"]
    )


def top_terms_from_state(state_root: str, k: int = 5) -> ray.data.Dataset:
    """Top-k terms per group over the folded state — row-for-row equal to
    batch ``top_terms_per_lang`` on the union of the folded epochs (same
    count-desc, token-asc tie-break). Arrow-native reduce: sort_indices +
    slice per group, no pandas hop."""

    def _topk(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[("count", "descending"), ("token", "ascending")]
        )[:k]
        t = g.take(idx)
        return pa.table({
            "lang": t.column("lang"),
            "rank": pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64)),
            "token": t.column("token"),
            "n": pc.cast(t.column("count"), pa.int64()),
        })

    _topk.__name__ = "lang_topk_state"
    return read_term_counts(state_root).groupby("lang").map_groups(
        _topk, batch_format="pyarrow"
    )


def reshard_state(state_root: str, new_num_buckets: int) -> dict:
    """Re-bucket the term state when the vocabulary outgrows its layout.
    The routing hash is already splitmix-finalized (stable_row_hash), so
    the re-bucketer applies the raw modulo the fold path uses."""
    from kafka_connect_jdbc_flatten_ray.stages.state_reshard import (
        reshard_modulo_state,
    )

    return reshard_modulo_state(
        state_root, STATE_TABLE, "gh", _ST_SCHEMA, new_num_buckets
    )


# ---------------------------------------------------------------------------
# incremental document frequency (the TF-IDF corpus statistic)
# ---------------------------------------------------------------------------

DF_TABLE = "df_state"

_DF_SCHEMA = pa.schema([
    ("gh", pa.int64()),
    ("token", pa.string()),
    ("df", pa.int64()),
])


def df_counts_epoch(
    docs: ray.data.Dataset,
    state_root: str,
    text: str = "text",
    num_buckets: int = 32,
) -> dict:
    """Fold one epoch of documents into the lake-resident document
    frequencies (distinct docs containing each token) and the running
    corpus size N — the statistics TF-IDF scoring needs. Each batch
    pre-reduces to one (token, df_part) row per distinct token (a doc is
    one input row, so its distinct-token set never spans batches), rows
    route by ``stable_row_hash(token) % N``, folds merge on the real
    token column (collision-safe) and sum df. Addition is commutative:
    epochs fold in any order, and :func:`tfidf_from_state` equals batch
    ``tfidf_top_terms`` over the union of the folded epochs."""
    from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
        MAX_FOLD_ROWS,
    )

    manifest = TableManifest(state_root, DF_TABLE)
    m = manifest.load()
    epoch = 0 if not m else int(m["epoch"]) + 1
    num_buckets = _stored_num_buckets(m, num_buckets)
    prior = {int(b): p for b, p in (m or {}).get("buckets", {}).items()}
    fs, root = fsx.resolve(state_root)
    fold_limit = MAX_FOLD_ROWS

    def _df_partial(t: pa.Table) -> pa.Table:
        txt = t.column(text)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        toks = pc.split_pattern(txt, " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), lens)
        rep = pa.table({"doc": pa.array(doc_idx),
                        "token": pc.list_flatten(toks)})
        # distinct (doc, token), then df_part = docs per token
        dd = pa.TableGroupBy(rep, ["doc", "token"]).aggregate([])
        agg = pa.TableGroupBy(dd, ["token"]).aggregate(
            [("token", "count")]
        ).rename_columns(["token", "df"])
        gh = stable_row_hash(agg, ("token",)).view(np.int64)
        out = pa.table({
            "gh": pa.array(gh),
            "token": agg.column("token"),
            "df": pc.cast(agg.column("df"), pa.int64()),
        })
        vb = gh.view(np.uint64)
        return out.append_column(
            "__bucket", pa.array((vb % np.uint64(num_buckets)).astype(np.int32))
        )

    def _fold(g: pa.Table) -> pa.Table:
        bucket = int(g.column("__bucket")[0].as_py())
        g = g.drop_columns(["__bucket"])
        _guard_fold(g.num_rows, "df_counts_epoch", num_buckets, fold_limit)
        out_dir = fsx.join(root, DF_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        state_path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, state_path)
        touched = np.unique(g.column("gh").to_numpy(zero_copy_only=False))
        state, writer, carried = _split_prior_state(
            fs, prior.get(bucket), "gh", touched, _DF_SCHEMA, staged
        )
        both = g.select(_DF_SCHEMA.names)
        if state is not None and state.num_rows:
            both = pa.concat_tables([state.select(_DF_SCHEMA.names), both])
        agg = pa.TableGroupBy(both, ["gh", "token"]).aggregate(
            [("df", "sum")]
        ).rename_columns(["gh", "token", "df"])
        out = pa.table({
            "gh": agg.column("gh"),
            "token": agg.column("token"),
            "df": pc.cast(agg.column("df"), pa.int64()),
        })
        writer.write_table(out.cast(_DF_SCHEMA))
        writer.close()
        fsx.publish_file(fs, staged, state_path)
        return pa.table({
            "bucket": [bucket],
            "state_path": [state_path],
            "tokens": [out.num_rows + carried],
        })

    _fold.__name__ = "df_fold"
    nonce = manifest.claim_epoch(epoch)
    try:
        n_docs = docs.count()  # the running-N contribution (cheap pass)
        stats = (
            docs.map_batches(_df_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_fold, batch_format="pyarrow")
            .take_all()
        )
    except Exception:
        manifest.abandon_epoch(epoch)
        raise
    bucket_files = {int(r["bucket"]): r["state_path"] for r in stats}
    totals = {"tokens": int(sum(r["tokens"] for r in stats)),
              "docs": int(n_docs)}
    manifest.publish(
        epoch, bucket_files, totals,
        partitioning={"num_buckets": num_buckets, "key_pk_cols": ["gh"],
                      "hash_version": 2},
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "buckets": len(bucket_files), **totals}


def corpus_docs_total(state_root: str) -> int:
    """Running corpus size N = sum of every folded epoch's doc count
    (recorded in the manifest lineage — no data read)."""
    m = TableManifest(state_root, DF_TABLE).load()
    if not m:
        raise ValueError(f"no {DF_TABLE} manifest at {state_root}")
    return int(sum(e.get("docs", 0) for e in m["epochs"]))


def tfidf_from_state(
    docs: ray.data.Dataset, state_root: str, k: int = 3
) -> ray.data.Dataset:
    """Score documents against the ACCUMULATED df/N statistics — equal to
    batch ``tfidf_top_terms`` over the union of the folded epochs when
    ``docs`` is that union (same union+groupby df attach, no vocabulary
    broadcast, same 6-decimal rounding and rank rule)."""
    from kafka_connect_jdbc_flatten_ray.stages.textops import (
        _doc_topk_fn,
        _tf_rows,
    )

    total_docs = corpus_docs_total(state_root)
    manifest = TableManifest(state_root, DF_TABLE)
    fs, _ = fsx.resolve(state_root)
    files = sorted(manifest.current_files().values())

    def _df_rows(t: pa.Table) -> pa.Table:
        if "bucket" in t.schema.names:
            t = t.drop_columns(["bucket"])
        n = t.num_rows
        return pa.table({
            "token": t.column("token"),
            "doc_id": pa.array(np.full(n, -1, np.int64)),
            "tf": pc.multiply(t.column("df"), -1),  # df rides as -df
        })

    tf = docs.map_batches(_tf_rows, batch_format="pyarrow",
                          zero_copy_batch=True)
    dfr = read_parquet_clean(files, filesystem=fs,
                             columns=["token", "df"]).map_batches(
        _df_rows, batch_format="pyarrow", zero_copy_batch=True)

    def _attach(g: pa.Table) -> pa.Table:
        tfv = g.column("tf").to_numpy(zero_copy_only=False)
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        is_df = did == -1
        if not is_df.any():
            # token appears in the scored docs but was never folded into
            # the df state: idf is undefined, and emitting nothing would
            # silently truncate that doc's top-k. Fail loudly, matching
            # the other state families' parameter-mismatch convention.
            raise ValueError(
                "tfidf_from_state: token "
                f"{g.column('token')[0].as_py()!r} appears in the scored "
                "docs but not in the folded df state — fold the docs' "
                "epoch(s) first (docs must be a subset of the folded union)"
            )
        if is_df.all():
            # token in the state but absent from the scored docs — normal
            # when scoring a subset of the folded union; nothing to score
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64())})
        n_df = int(-tfv[is_df].sum())
        sel = ~is_df
        score = np.round(
            tfv[sel].astype(np.float64) * np.log(float(total_docs) / n_df), 6
        )
        tok = g.column("token")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        return pa.table({
            "doc_id": pa.array(did[sel]),
            "token": tok.filter(pa.array(sel)),
            "score": pa.array(score, pa.float64()),
        })

    scored = tf.union(dfr).groupby("token").map_groups(
        _attach, batch_format="pyarrow"
    )
    return scored.groupby("doc_id").map_groups(
        _doc_topk_fn(k), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# incremental bigram counts (the bigram-LM corpus statistic)
# ---------------------------------------------------------------------------

BIGRAM_TABLE = "bigram_state"

_BG_SCHEMA = pa.schema([
    ("gh", pa.int64()),
    ("w1", pa.string()),
    ("w2", pa.string()),
    ("count", pa.int64()),
])


def bigram_counts_epoch(
    docs: ray.data.Dataset,
    state_root: str,
    text: str = "text",
    num_buckets: int = 32,
) -> dict:
    """Fold one epoch of documents into lake-resident bigram occurrence
    counts — the corpus statistic of textops.bigram_lm_score. Each batch
    pre-reduces to one (w1, w2, count) partial per distinct bigram, rows
    route by ``stable_row_hash(w1, w2) % N``, folds merge on the REAL
    (w1, w2) columns (routing-hash collisions can never merge distinct
    bigrams) and sum counts. Addition is commutative: epochs fold in any
    order, and :func:`lm_score_from_state` equals batch
    ``bigram_lm_score`` over the union of the folded epochs."""
    from kafka_connect_jdbc_flatten_ray.stages.streaming_windows import (
        MAX_FOLD_ROWS,
    )
    from kafka_connect_jdbc_flatten_ray.stages.textops import _bigram_rows

    manifest = TableManifest(state_root, BIGRAM_TABLE)
    m = manifest.load()
    epoch = 0 if not m else int(m["epoch"]) + 1
    num_buckets = _stored_num_buckets(m, num_buckets)
    prior = {int(b): p for b, p in (m or {}).get("buckets", {}).items()}
    fs, root = fsx.resolve(state_root)
    fold_limit = MAX_FOLD_ROWS

    def _partial(t: pa.Table) -> pa.Table:
        per_doc = _bigram_rows(t)  # (w1, w2, doc_id, m) — exact per doc
        agg = pa.TableGroupBy(per_doc, ["w1", "w2"]).aggregate(
            [("m", "sum")]
        ).rename_columns(["w1", "w2", "count"])
        gh = stable_row_hash(agg, ("w1", "w2")).view(np.int64)
        out = pa.table({
            "gh": pa.array(gh),
            "w1": agg.column("w1"),
            "w2": agg.column("w2"),
            "count": pc.cast(agg.column("count"), pa.int64()),
        })
        vb = gh.view(np.uint64)
        return out.append_column(
            "__bucket", pa.array((vb % np.uint64(num_buckets)).astype(np.int32))
        )

    def _fold(g: pa.Table) -> pa.Table:
        bucket = int(g.column("__bucket")[0].as_py())
        g = g.drop_columns(["__bucket"])
        _guard_fold(g.num_rows, "bigram_counts_epoch", num_buckets, fold_limit)
        out_dir = fsx.join(root, BIGRAM_TABLE, f"bucket={bucket:05d}")
        fsx.makedirs(fs, out_dir)
        state_path = fsx.join(out_dir, f"epoch-{epoch:06d}.parquet")
        staged = fsx.staging_path(fs, state_path)
        touched = np.unique(g.column("gh").to_numpy(zero_copy_only=False))
        state, writer, carried = _split_prior_state(
            fs, prior.get(bucket), "gh", touched, _BG_SCHEMA, staged
        )
        both = g.select(_BG_SCHEMA.names)
        if state is not None and state.num_rows:
            both = pa.concat_tables([state.select(_BG_SCHEMA.names), both])
        agg = pa.TableGroupBy(both, ["gh", "w1", "w2"]).aggregate(
            [("count", "sum")]
        ).rename_columns(["gh", "w1", "w2", "count"])
        out = pa.table({
            "gh": agg.column("gh"),
            "w1": agg.column("w1"),
            "w2": agg.column("w2"),
            "count": pc.cast(agg.column("count"), pa.int64()),
        })
        writer.write_table(out.cast(_BG_SCHEMA))
        writer.close()
        fsx.publish_file(fs, staged, state_path)
        return pa.table({
            "bucket": [bucket],
            "state_path": [state_path],
            "bigrams": [out.num_rows + carried],
            "epoch_count": [int(pc.sum(g.column("count")).as_py())],
        })

    _fold.__name__ = "bigram_fold"
    nonce = manifest.claim_epoch(epoch)
    try:
        stats = (
            docs.map_batches(_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("__bucket")
            .map_groups(_fold, batch_format="pyarrow")
            .take_all()
        )
    except Exception:
        manifest.abandon_epoch(epoch)
        raise
    bucket_files = {int(r["bucket"]): r["state_path"] for r in stats}
    totals = {k: int(sum(r[k] for r in stats))
              for k in ("bigrams", "epoch_count")}
    manifest.publish(
        epoch, bucket_files, totals,
        partitioning={"num_buckets": num_buckets, "key_pk_cols": ["gh"],
                      "hash_version": 2},
        claim_nonce=nonce,
    )
    return {"epoch": epoch, "buckets": len(bucket_files), **totals}


def lm_score_from_state(
    docs: ray.data.Dataset, state_root: str
) -> ray.data.Dataset:
    """Score documents against the ACCUMULATED bigram counts — equal to
    batch ``bigram_lm_score`` over the union of the folded epochs when
    ``docs`` is that union (same ln(c12/c1) per-occurrence mean, same
    6-decimal rounding), sharing its SQL oracle verbatim. State rows ride
    the (w1, w2) groupby as doc_id = -1 count rows; every state pair
    forwards one (w1, c12) row into the w1 group so c(w1, .) sums over
    ALL followers, scored or not. A doc bigram absent from the state
    fails loudly (the tfidf_from_state convention)."""
    from kafka_connect_jdbc_flatten_ray.stages.textops import _bigram_rows

    manifest = TableManifest(state_root, BIGRAM_TABLE)
    fs, _ = fsx.resolve(state_root)
    files = sorted(manifest.current_files().values())

    def _doc_rows(t: pa.Table) -> pa.Table:
        r = _bigram_rows(t)
        return pa.table({
            "w1": r.column("w1"),
            "w2": r.column("w2"),
            "doc_id": r.column("doc_id"),
            "m": r.column("m"),
        })

    def _state_rows(t: pa.Table) -> pa.Table:
        if "bucket" in t.schema.names:
            t = t.drop_columns(["bucket"])
        n = t.num_rows
        return pa.table({
            "w1": t.column("w1"),
            "w2": t.column("w2"),
            "doc_id": pa.array(np.full(n, -1, np.int64)),
            "m": t.column("count"),
        })

    def _attach_c12(g: pa.Table) -> pa.Table:
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        mv = g.column("m").to_numpy(zero_copy_only=False)
        is_state = did == -1
        if not is_state.any():
            raise ValueError(
                "lm_score_from_state: bigram "
                f"({g.column('w1')[0].as_py()!r}, "
                f"{g.column('w2')[0].as_py()!r}) appears in the scored "
                "docs but not in the folded bigram state — fold the docs' "
                "epoch(s) first (docs must be a subset of the folded union)"
            )
        c12 = int(mv[is_state].sum())
        keep = ~is_state
        w1 = g.column("w1")
        if isinstance(w1, pa.ChunkedArray):
            w1 = w1.combine_chunks()
        sel = pa.array(keep)
        doc_part = pa.table({
            "w1": w1.filter(sel),
            "doc_id": pa.array(did[keep]),
            "m": pa.array(mv[keep]),
            "c12": pa.array(np.full(int(keep.sum()), c12, np.int64)),
        })
        # one forwarding row per state pair: its c12 contributes to c(w1,.)
        fwd = pa.table({
            "w1": w1.slice(0, 1),
            "doc_id": pa.array([-1], pa.int64()),
            "m": pa.array([c12], pa.int64()),
            "c12": pa.array([c12], pa.int64()),
        })
        return pa.concat_tables([doc_part, fwd])

    _attach_c12.__name__ = "attach_c12_state"

    def _attach_c1(g: pa.Table) -> pa.Table:
        did = g.column("doc_id").to_numpy(zero_copy_only=False)
        mv = g.column("m").to_numpy(zero_copy_only=False)
        is_state = did == -1
        c1 = float(mv[is_state].sum())
        keep = ~is_state
        m = mv[keep].astype(np.float64)
        c12 = g.column("c12").to_numpy(zero_copy_only=False)[keep].astype(
            np.float64)
        return pa.table({
            "doc_id": pa.array(did[keep]),
            "m": pa.array(mv[keep]),
            "lp": pa.array(m * np.log(c12 / c1), pa.float64()),
        })

    _attach_c1.__name__ = "attach_c1_state"

    def _doc_avg(g: pa.Table) -> pa.Table:
        m = g.column("m").to_numpy(zero_copy_only=False)
        lp = g.column("lp").to_numpy(zero_copy_only=False)
        n = int(m.sum())
        return pa.table({
            "doc_id": pa.array([g.column("doc_id")[0].as_py()], pa.int64()),
            "avg_logprob": pa.array([round(float(lp.sum()) / n, 6)],
                                    pa.float64()),
            "n_bigrams": pa.array([n], pa.int64()),
        })

    _doc_avg.__name__ = "doc_avg_logprob_state"
    dr = docs.map_batches(_doc_rows, batch_format="pyarrow",
                          zero_copy_batch=True)
    sr = read_parquet_clean(files, filesystem=fs,
                            columns=["w1", "w2", "count"]).map_batches(
        _state_rows, batch_format="pyarrow", zero_copy_batch=True)
    return (
        dr.union(sr)
        .groupby(["w1", "w2"]).map_groups(_attach_c12, batch_format="pyarrow")
        .groupby("w1").map_groups(_attach_c1, batch_format="pyarrow")
        .groupby("doc_id").map_groups(_doc_avg, batch_format="pyarrow")
    )


def reshard_bigram_state(state_root: str, new_num_buckets: int) -> dict:
    """Re-bucket the bigram state (routing hash already splitmix-final)."""
    from kafka_connect_jdbc_flatten_ray.stages.state_reshard import (
        reshard_modulo_state,
    )

    return reshard_modulo_state(
        state_root, BIGRAM_TABLE, "gh", _BG_SCHEMA, new_num_buckets
    )


def bpe_merges_from_state(state_root: str, num_merges: int = 8):
    """Train BPE merges from the ACCUMULATED term-count state — equal to
    batch ``textops.bpe_merges`` over the union of the folded epochs
    (word counts are order-independent sums; training is deterministic),
    so it shares that query's SQL oracle verbatim. The distributed work
    already happened at fold time; this read aggregates the per-(group,
    token) state down to (token, count) and trains on the compact
    vocabulary driver-side with the same loud MAX_BPE_VOCAB bound."""
    from kafka_connect_jdbc_flatten_ray.stages.textops import (
        MAX_BPE_VOCAB, _train_from_vocab,
    )

    rows = (
        read_term_counts(state_root)
        .groupby("token").sum("count")
        .take_all()
    )
    if len(rows) > MAX_BPE_VOCAB:
        raise ValueError(
            f"bpe_merges_from_state: vocabulary has {len(rows)} distinct "
            f"words (> {MAX_BPE_VOCAB}); raise MAX_BPE_VOCAB or pre-filter"
        )
    words = [r["token"] for r in rows]
    counts = np.array([r["sum(count)"] for r in rows], np.int64)
    return _train_from_vocab(words, counts, num_merges)
