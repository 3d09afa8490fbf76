"""SLAM back-end protocol (E8) — future-based async interface.

Rebuild of the mola-kernel BackEndBase contract the reference drives:
``addKeyFrame(ProposeKF_Input) → future<ProposeKF_Output>`` (reference
src/LidarOdometry.cpp:346-368), ``addFactor(Factor) → future`` (:435-455,
:818-830), ``advertiseUpdatedLocalization(...) → future`` (:484-491), and
the ``FactorRelativePose3`` payload with its fixed diagonal noise
(0.10 m / 1°, :444-445).

``InMemoryBackend`` is the recording implementation used by tests and
standalone replay (SURVEY.md §4.4 fake-backend pattern); a real back-end
(factor-graph optimizer) plugs in behind the same protocol.
"""

from __future__ import annotations

import itertools
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np


@dataclass
class ProposeKFInput:
    timestamp: float
    observations: Optional[list] = None  # optional raw observations


@dataclass
class ProposeKFOutput:
    success: bool
    new_kf_id: Optional[int] = None


@dataclass
class FactorRelativePose3:
    """SE(3) relative-pose factor between two keyframes."""

    kf_from: int
    kf_to: int
    rel_pose: object  # geometry.se3.Pose (host-side, numpy-backed is fine)
    noise_model_diag_xyz: float = 0.10          # meters (reference :444)
    noise_model_diag_rot: float = np.deg2rad(1.0)  # radians (reference :445)


@dataclass
class AddFactorOutput:
    success: bool
    new_factor_id: Optional[int] = None


@dataclass
class AdvertiseLocalization:
    timestamp: float
    reference_kf: int
    pose: object  # geometry.se3.Pose


class BackEndBase:
    """Protocol: all calls return futures; the back-end runs elsewhere."""

    def add_keyframe(self, kf: ProposeKFInput) -> "Future[ProposeKFOutput]":
        raise NotImplementedError

    def add_factor(self, f: FactorRelativePose3) -> "Future[AddFactorOutput]":
        raise NotImplementedError

    def advertise_updated_localization(
        self, loc: AdvertiseLocalization
    ) -> "Future[None]":
        raise NotImplementedError


class InMemoryBackend(BackEndBase):
    """Thread-backed recording back-end: assigns ids, stores the factor
    stream for assertions, mirrors the reference's future semantics."""

    def __init__(self, max_workers: int = 1):
        self._pool = ThreadPoolExecutor(max_workers=max_workers,
                                        thread_name_prefix="backend")
        self._lock = threading.Lock()
        self._kf_ids = itertools.count(0)
        self._factor_ids = itertools.count(0)
        self.keyframes: Dict[int, ProposeKFInput] = {}
        self.factors: List[FactorRelativePose3] = []
        self.localizations: List[AdvertiseLocalization] = []

    def add_keyframe(self, kf: ProposeKFInput) -> Future:
        def work():
            with self._lock:
                kf_id = next(self._kf_ids)
                self.keyframes[kf_id] = kf
            return ProposeKFOutput(True, kf_id)

        return self._pool.submit(work)

    def add_factor(self, f: FactorRelativePose3) -> Future:
        def work():
            with self._lock:
                fid = next(self._factor_ids)
                self.factors.append(f)
            return AddFactorOutput(True, fid)

        return self._pool.submit(work)

    def advertise_updated_localization(self, loc: AdvertiseLocalization) -> Future:
        def work():
            with self._lock:
                self.localizations.append(loc)

        return self._pool.submit(work)

    def shutdown(self):
        self._pool.shutdown(wait=True)
