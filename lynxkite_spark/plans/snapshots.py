"""Named snapshots: a human-name → checkpoint-key registry over
CheckpointManager, re-creating the reference's saved-state surface
(frontend_operations/ImportOperations.scala:431-453 "Import snapshot" /
"Save to snapshot" and the well-known-datasets list at :455).

The content store stays content-hash-keyed (plans/checkpoint.py); this
layer only maps stable user-facing names onto it, so re-saving a name
points it at a new key without touching the old data (time-travel via
``versions``) and two names holding identical content share storage
decisions upstream.  The registry file is one small JSON document —
driver-side by design, like the reference's meta store.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame

from .checkpoint import CheckpointManager, step_key, table_fingerprint


class SnapshotRegistry:
    """save/load/list/delete named DataFrame (and Graph) snapshots."""

    def __init__(self, checkpoints: CheckpointManager):
        self.cm = checkpoints
        self.path = os.path.join(checkpoints.root, "_snapshots.json")

    # -- registry file ----------------------------------------------------
    def _read(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _write(self, reg: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(reg, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    # -- DataFrame snapshots ----------------------------------------------
    def save(self, name: str, df: DataFrame, overwrite: bool = True) -> str:
        """Persist ``df`` and bind ``name`` to it; returns the content
        key.  With ``overwrite=False`` an existing name raises (the
        reference's save box fails on name collisions unless asked)."""
        reg = self._read()
        if name in reg and not overwrite:
            raise ValueError(f"snapshot {name!r} already exists")
        fp = table_fingerprint(df)
        key = step_key(fp, "snapshot", {"name": name})
        if not self.cm.exists(key):
            self.cm.save(df, key, metrics={"snapshot": name, "fingerprint": fp})
        entry = reg.get(name, {"versions": []})
        entry["key"] = key
        entry["saved_at"] = time.time()
        entry["schema"] = df.schema.simpleString()
        if key not in entry["versions"]:
            entry["versions"].append(key)
        reg[name] = entry
        self._write(reg)
        return key

    def load(self, name: str, version: str | None = None) -> DataFrame:
        reg = self._read()
        if name not in reg:
            raise KeyError(f"no snapshot named {name!r}")
        key = version or reg[name]["key"]
        if version is not None and version not in reg[name]["versions"]:
            raise KeyError(f"snapshot {name!r} has no version {version!r}")
        df = self.cm.load(key)
        if df is None:
            raise KeyError(f"snapshot {name!r} data missing for key {key}")
        return df

    def list(self) -> list[dict]:
        """Listable saved states, newest first."""
        reg = self._read()
        return sorted(
            ({"name": n, **{k: v for k, v in e.items() if k != "versions"},
              "n_versions": len(e["versions"])} for n, e in reg.items()),
            key=lambda e: -e["saved_at"],
        )

    def delete(self, name: str) -> None:
        reg = self._read()
        reg.pop(name, None)
        self._write(reg)

    # -- Graph snapshots (two named tables) -------------------------------
    def save_graph(self, name: str, graph, overwrite: bool = True) -> tuple[str, str]:
        if not overwrite:
            # check both names up front so a collision on either side
            # cannot leave a dangling half-snapshot behind
            reg = self._read()
            taken = [n for n in (f"{name}/vertices", f"{name}/edges")
                     if n in reg]
            if taken:
                raise ValueError(f"snapshot name(s) already exist: {taken}")
        return (
            self.save(f"{name}/vertices", graph.vertices, overwrite),
            self.save(f"{name}/edges", graph.edges, overwrite),
        )

    def load_graph(self, name: str):
        from ..graph import Graph

        return Graph(
            vertices=self.load(f"{name}/vertices"),
            edges=self.load(f"{name}/edges"),
        )


def well_known_datasets(spark) -> dict:
    """ImportOperations.scala:455's built-in dataset list, re-pointed at
    what ships here: loader callables keyed by name."""
    from ..graph import example_graph

    return {
        "example graph": lambda: example_graph(spark),
    }
