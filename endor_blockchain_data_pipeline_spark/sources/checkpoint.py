"""Checkpointed offsets + committed-batch registry.

The commit manifest IS the durable checkpoint (single atomic rename covers
data + offsets + batch registry — no torn state possible). This module adds
a convenience view over it plus a host-side offsets file mirroring the
reference's producer offset (``export_batch.py:40-42,108-109`` keeps
``last_exported_ethereum_block``); the file is a cache only — on conflict
the manifests win.
"""

from __future__ import annotations

import json
import os

from endor_blockchain_data_pipeline_spark.sources.lake import ManifestTable


class Checkpoint:
    def __init__(self, table: ManifestTable) -> None:
        self.table = table
        self._offsets_path = os.path.join(table.path, "_checkpoints", "offsets.json")
        os.makedirs(os.path.dirname(self._offsets_path), exist_ok=True)

    def last_lsn(self) -> int:
        """Resume point: authoritative from the latest commit manifest."""
        return self.table.watermark()

    def committed(self) -> set[str]:
        return self.table.committed_batches()

    def is_committed(self, batch_id: str) -> bool:
        return batch_id in self.committed()

    def record(self, batch_id: str, lsn_hi: int) -> None:
        """Write the advisory offsets cache (atomic tmp+rename)."""
        tmp = self._offsets_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"last_batch_id": batch_id, "last_lsn": lsn_hi}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, self._offsets_path)

    def advisory(self) -> dict | None:
        if not os.path.exists(self._offsets_path):
            return None
        with open(self._offsets_path) as fh:
            return json.load(fh)
