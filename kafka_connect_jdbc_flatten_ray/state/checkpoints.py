"""Source offsets / checkpoint state (ST5 analogue).

The reference persists per-table ``(incrementing, timestamp)`` offsets via
Connect offset storage with protocol-versioned partition keys
(TimestampIncrementingOffset.java:54-84, OffsetProtocols.java:37-59, restore
JdbcSourceTask.java:113-194). Our analogue: one JSON file per checkpoint
epoch recording, per kafka partition, the max applied offset; resume =
filter the event log to ``offset > checkpoint[partition]``.

Files are written tmp+rename (atomic) and are append-only per epoch, so a
crashed run resumes from the last published epoch.
"""

from __future__ import annotations

import json
import os


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, epoch: int) -> str:
        return os.path.join(self.root, f"checkpoint-{epoch:06d}.json")

    def latest_epoch(self) -> int | None:
        epochs = [
            int(f.split("-")[1].split(".")[0])
            for f in os.listdir(self.root)
            if f.startswith("checkpoint-") and f.endswith(".json")
        ]
        return max(epochs) if epochs else None

    def load(self, epoch: int | None = None) -> dict[int, int]:
        """partition -> max applied offset ({} when no checkpoint yet)."""
        if epoch is None:
            epoch = self.latest_epoch()
        if epoch is None:
            return {}
        with open(self._path(epoch)) as f:
            data = json.load(f)
        # dual-protocol restore (OffsetProtocols.java:37-59 analogue): V1
        # wraps offsets under a key; V0 is the bare {partition: offset} map
        offsets = data["offsets"] if "offsets" in data else data
        return {int(k): int(v) for k, v in offsets.items()}

    def save(self, epoch: int, offsets: dict[int, int], metrics: dict | None = None) -> str:
        path = self._path(epoch)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"epoch": epoch, "offsets": {str(k): int(v) for k, v in offsets.items()},
                 "metrics": metrics or {}},
                f, indent=1,
            )
        os.replace(tmp, path)
        return path
