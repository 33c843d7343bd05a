"""Lake-table manifests: schema registry + epoch lineage + metrics.

The analogue of the reference's table-definition cache / DDL state (ST4,
DbStructure.java:47-102, util/TableDefinitions.java): a JSON manifest per
lake table directory recording, per epoch, the bucket files that make up the
current state, the unified schema, and per-epoch lineage/metrics (rows in,
clears applied, rows out).  Readers resolve current state through the
manifest (not by globbing), so a half-written epoch is invisible until the
manifest swap — this is the transaction boundary (W7,
JdbcDbWriter.java:217-224).

The lake root may be a POSIX path or a ``pyarrow.fs`` URI; publishes follow
state/fs.py's atomicity model.
"""

from __future__ import annotations

import json
import posixpath

from kafka_connect_jdbc_flatten_ray.state import fs as fsx


class TableManifest:
    def __init__(self, lake_root: str, table: str, filesystem=None):
        self.fs, root = fsx.resolve(lake_root, filesystem)
        self.dir = posixpath.join(root, table)
        self.path = posixpath.join(self.dir, "manifest.json")
        self.table = table

    def load(self) -> dict | None:
        if not fsx.exists(self.fs, self.path):
            return None
        return json.loads(fsx.read_bytes(self.fs, self.path))

    def current_files(self) -> dict[int, str]:
        m = self.load()
        if not m:
            return {}
        return {int(b): p for b, p in m["buckets"].items()}

    def current_deltas(self) -> dict[int, list[str]]:
        """Merge-on-read delta files per bucket (empty for pure-CoW lakes)."""
        m = self.load()
        if not m:
            return {}
        return {int(b): list(ps) for b, ps in (m.get("deltas") or {}).items()}

    def _marker(self, epoch: int) -> str:
        return posixpath.join(self.dir, "_epochs", f"epoch-{epoch:06d}.json")

    def claim_epoch(self, epoch: int) -> str:
        """Claim the epoch number BEFORE any data file is written.

        Single-writer CAS (the analogue of the reference's concurrent-DDL
        retry contract, DbStructure.java:127-234 amendIfNecessary): the
        claim is an exclusive marker create carrying a per-writer nonce.
        Epoch data files live at deterministic paths
        (``bucket=N/epoch-M.parquet``), so two writers that both computed
        epoch M would overwrite each other's files if the loser were
        allowed to run its fold tasks — claiming up front makes the loser
        fail with ConcurrentWriteError before it writes anything. Returns
        the nonce; pass it to :meth:`publish` so the commit can verify the
        claim is still ours. A writer that crashed after claiming leaves a
        stale marker; ``abandon_epoch(epoch)`` clears it after operator
        review (indistinguishable from a live writer without leases)."""
        import secrets

        nonce = secrets.token_hex(8)
        fsx.makedirs(self.fs, posixpath.join(self.dir, "_epochs"))
        fsx.create_exclusive(
            self.fs, self._marker(epoch),
            json.dumps({"epoch": epoch, "writer": nonce}).encode(),
        )
        return nonce

    def publish(
        self,
        epoch: int,
        bucket_files: dict[int, str],
        stats: dict,
        schema_str: str | None = None,
        partitioning: dict | None = None,
        delta_files: dict[int, str] | None = None,
        clear_deltas: bool = False,
        claim_nonce: str | None = None,
        replace_buckets: bool = False,
    ) -> None:
        """Atomic manifest swap: current state becomes the new epoch's files.

        Buckets untouched this epoch keep their previous file (bounded
        rewrite scope — only buckets that saw ops are rewritten).
        ``partitioning`` records {num_buckets, key_pk_cols} at write time so
        readers (lake_lookup bucket pruning) never assume defaults.
        ``delta_files`` (merge-on-read epochs) append per-bucket delta
        files instead of replacing base files; ``clear_deltas`` (compaction)
        drops all delta references after folding them into new bases.

        ``claim_nonce``: the token from :meth:`claim_epoch` when the epoch
        was claimed up front (required for writers whose fold tasks publish
        data files before the commit); verified against the marker so a
        writer whose claim was abandoned-and-reclaimed cannot commit over
        the new owner. Without a nonce the marker is claimed here (legacy
        commit-time CAS — safe only when no data file was written before).
        """
        marker = self._marker(epoch)
        if claim_nonce is not None:
            got = json.loads(fsx.read_bytes(self.fs, marker))
            if got.get("writer") != claim_nonce:
                raise fsx.ConcurrentWriteError(
                    f"epoch {epoch} marker is owned by another writer "
                    f"({got.get('writer')!r}); refusing to commit"
                )
        else:
            fsx.makedirs(self.fs, posixpath.join(self.dir, "_epochs"))
            fsx.create_exclusive(
                self.fs, marker, json.dumps({"epoch": epoch, **stats}).encode()
            )
        prev = self.load() or {"buckets": {}, "epochs": []}
        # replace_buckets: the new map IS the state (reshard — stale ids
        # from the old layout must not survive the merge)
        buckets = ({} if replace_buckets
                   else {int(b): p for b, p in prev["buckets"].items()})
        buckets.update(bucket_files)
        deltas = {int(b): list(ps) for b, ps in (prev.get("deltas") or {}).items()}
        if clear_deltas:
            deltas = {}
        for b, p in (delta_files or {}).items():
            deltas.setdefault(int(b), []).append(p)
        m = {
            "table": self.table,
            "epoch": epoch,
            "schema": schema_str or prev.get("schema"),
            "partitioning": partitioning or prev.get("partitioning"),
            "buckets": {str(b): p for b, p in sorted(buckets.items())},
            "deltas": {str(b): ps for b, ps in sorted(deltas.items())},
            "epochs": prev["epochs"] + [{"epoch": epoch, **stats}],
        }
        fsx.makedirs(self.fs, self.dir)
        fsx.write_bytes_atomic(self.fs, self.path, json.dumps(m, indent=1).encode())

    def abandon_epoch(self, epoch: int) -> None:
        """Clear a stale epoch claim left by a writer that crashed between
        its marker create and the manifest swap, so the next writer can
        re-claim the number. Refuses if the manifest already committed the
        epoch (that claim is not stale)."""
        m = self.load()
        if m and int(m["epoch"]) >= epoch:
            raise ValueError(
                f"epoch {epoch} is committed in the manifest; refusing to "
                "abandon a completed epoch"
            )
        marker = posixpath.join(self.dir, "_epochs", f"epoch-{epoch:06d}.json")
        if fsx.exists(self.fs, marker):
            fsx.delete_file(self.fs, marker)
