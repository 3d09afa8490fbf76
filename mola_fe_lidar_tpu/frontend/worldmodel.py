"""WorldModel — entity/annotation store with RW locks and disk spill (E9).

Rebuild of the mola-kernel WorldModel surface the reference uses:
string-keyed per-entity annotations (``entity_annotations_by_id``, reference
src/LidarOdometry.cpp:384-388 storing the keyframe's layered cloud under
``"lidar-pointcloud-layers"``, :658-666 reading it back),
``entity_neighbors`` (:614-630), read/write locks (:374-429, :610-669), and
the transparent disk swap of old entities the reference notes at :640-643.

Spill policy: least-recently-used keyframe clouds beyond ``max_resident``
are serialized to ``spill_dir`` as npz and reloaded on access — host RAM ↔
disk here, mirroring the WorldModel's RAM ↔ disk swap (device HBM holds
only the clouds actively being aligned, which flow through as pytrees).
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from pathlib import Path
from typing import Any, Dict, List, Optional, Set

from ..cloud.metric_map import MetricMap, load_metric_map, save_metric_map

ANNOTATION_NAME_PC_LAYERS = "lidar-pointcloud-layers"  # reference :41
ANNOTATION_NAME_RENDER_DECORATION = "render_decoration"  # reference :420-425


class WorldModel:
    def __init__(self, spill_dir: Optional[str] = None, max_resident: int = 64):
        self._lock = threading.RLock()
        self._entities: Set[int] = set()
        self._annotations: Dict[int, Dict[str, Any]] = {}
        self._neighbors: Dict[int, Set[int]] = {}
        self._spill_dir = Path(spill_dir) if spill_dir else None
        self._max_resident = max_resident
        self._resident: "OrderedDict[int, bool]" = OrderedDict()  # LRU of ids w/ cloud in RAM

    # -- locks (context managers; reference entities_lock_for_write etc.) --
    def lock_for_read(self):
        return self._lock

    def lock_for_write(self):
        return self._lock

    # -- entities ----------------------------------------------------------
    def add_entity(self, entity_id: int) -> None:
        with self._lock:
            self._entities.add(entity_id)
            self._annotations.setdefault(entity_id, {})
            self._neighbors.setdefault(entity_id, set())

    def entities(self) -> List[int]:
        with self._lock:
            return sorted(self._entities)

    def add_neighbors(self, a: int, b: int) -> None:
        """Record a factor between two entities (entity_neighbors source)."""
        with self._lock:
            self._neighbors.setdefault(a, set()).add(b)
            self._neighbors.setdefault(b, set()).add(a)

    def entity_neighbors(self, entity_id: int) -> Set[int]:
        with self._lock:
            return set(self._neighbors.get(entity_id, set()))

    # -- annotations --------------------------------------------------------
    def annotate(self, entity_id: int, key: str, value: Any) -> None:
        with self._lock:
            self.add_entity(entity_id)
            self._annotations[entity_id][key] = value
            if key == ANNOTATION_NAME_PC_LAYERS:
                self._touch(entity_id)
                self._maybe_spill()

    def annotation(self, entity_id: int, key: str) -> Any:
        """Read an annotation; transparently reloads a spilled cloud."""
        with self._lock:
            ann = self._annotations.get(entity_id, {})
            if key == ANNOTATION_NAME_PC_LAYERS and key not in ann:
                loaded = self._load_spilled(entity_id)
                if loaded is not None:
                    ann[key] = loaded
                    self._touch(entity_id)
                    self._maybe_spill()
            return ann.get(key)

    def has_annotation(self, entity_id: int, key: str) -> bool:
        with self._lock:
            if key in self._annotations.get(entity_id, {}):
                return True
            if key == ANNOTATION_NAME_PC_LAYERS and self._spill_path(entity_id):
                return self._spill_path(entity_id).exists()
            return False

    # -- spill machinery ----------------------------------------------------
    def _touch(self, entity_id: int) -> None:
        self._resident.pop(entity_id, None)
        self._resident[entity_id] = True

    def _spill_path(self, entity_id: int) -> Optional[Path]:
        if self._spill_dir is None:
            return None
        return self._spill_dir / f"kf_{entity_id:08d}.npz"

    def _maybe_spill(self) -> None:
        if self._spill_dir is None:
            return
        self._spill_dir.mkdir(parents=True, exist_ok=True)
        while len(self._resident) > self._max_resident:
            victim, _ = self._resident.popitem(last=False)
            cloud: Optional[MetricMap] = self._annotations[victim].pop(
                ANNOTATION_NAME_PC_LAYERS, None
            )
            if cloud is not None:
                save_metric_map(str(self._spill_path(victim)), cloud)

    def _load_spilled(self, entity_id: int) -> Optional[MetricMap]:
        p = self._spill_path(entity_id)
        if p is not None and p.exists():
            return load_metric_map(str(p))
        return None

    def resident_count(self) -> int:
        with self._lock:
            return len(self._resident)
