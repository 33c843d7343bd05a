"""Source offsets / checkpoint state (ST5 analogue).

The reference persists per-table ``(incrementing, timestamp)`` offsets via
Connect offset storage with protocol-versioned partition keys
(TimestampIncrementingOffset.java:54-84, OffsetProtocols.java:37-59, restore
JdbcSourceTask.java:113-194). Our analogue: one JSON file per checkpoint
epoch recording, per kafka partition, the max applied offset; resume =
filter the event log to ``offset > checkpoint[partition]``.

Publishes are atomic per the filesystem's model (state/fs.py: tmp+rename
locally, single-PUT on object stores); the root may be a POSIX path or a
``pyarrow.fs`` URI.
"""

from __future__ import annotations

import json
import posixpath

from kafka_connect_jdbc_flatten_ray.state import fs as fsx


class CheckpointStore:
    def __init__(self, root: str, filesystem=None):
        self.fs, self.root = fsx.resolve(root, filesystem)
        fsx.makedirs(self.fs, self.root)

    def _path(self, epoch: int) -> str:
        return posixpath.join(self.root, f"checkpoint-{epoch:06d}.json")

    def latest_epoch(self) -> int | None:
        epochs = []
        for info in fsx.listdir(self.fs, self.root):
            name = info.base_name
            if name.startswith("checkpoint-") and name.endswith(".json"):
                epochs.append(int(name.split("-")[1].split(".")[0]))
        return max(epochs) if epochs else None

    def load(self, epoch: int | None = None) -> dict[int, int]:
        """partition -> max applied offset ({} when no checkpoint yet)."""
        if epoch is None:
            epoch = self.latest_epoch()
        if epoch is None:
            return {}
        data = json.loads(fsx.read_bytes(self.fs, self._path(epoch)))
        # dual-protocol restore (OffsetProtocols.java:37-59 analogue): V1
        # wraps offsets under a key; V0 is the bare {partition: offset} map
        offsets = data["offsets"] if "offsets" in data else data
        return {int(k): int(v) for k, v in offsets.items()}

    def save(self, epoch: int, offsets: dict[int, int], metrics: dict | None = None) -> str:
        path = self._path(epoch)
        payload = json.dumps(
            {"epoch": epoch, "offsets": {str(k): int(v) for k, v in offsets.items()},
             "metrics": metrics or {}},
            indent=1,
        ).encode()
        fsx.write_bytes_atomic(self.fs, path, payload)
        return path
