"""Rolling local map for scan-to-map odometry.

The reference registers each scan against the PREVIOUS scan only
(reference src/LidarOdometry.cpp:231-311), so per-pair noise integrates
into drift. Scan-to-map odometry — register against an aggregate of the
last K keyframe clouds — averages that noise out and is the standard
production upgrade (the nearby-KF/LC machinery is unchanged; this only
swaps the odometry ICP's target). Measured on the HDL-64 simulator at the
KITTI operating point it cuts per-scan ATE by ~5x (docs/accuracy.json).

Aggregation is a host-side, per-keyframe event (every ~3 m): transform
each kept keyframe's layers into the odometry-world frame (rotating
``normal`` attrs), concatenate, voxel-first dedup, and pad to a FIXED
capacity per layer (single-scan capacity x a multiplier, bucketed to 256)
so the device-side ICP program never recompiles between keyframes. All
per-scan compute stays on device; the map is just a different, larger
target cloud for the same fused align program.
"""

from __future__ import annotations

import functools
import threading
from collections import deque
from typing import Deque, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud import voxel
from ..cloud.metric_map import MetricMap, PointCloud, from_points
from ..cloud.voxel import hash_subsample_np
from ..cloud.voxel import voxel_first_indices_np as _voxel_first


def _round_up(n: int, mult: int = 256) -> int:
    return max(mult, (n + mult - 1) // mult * mult)


def _voxel_keys64(xyz: np.ndarray, res: float) -> np.ndarray:
    """Pack voxel coords into one int64 key (21 bits/axis, host-side)."""
    c = np.floor(xyz / res).astype(np.int64)
    m = np.int64((1 << 21) - 1)
    return ((c[:, 0] & m) << 42) | ((c[:, 1] & m) << 21) | (c[:, 2] & m)


class LocalMap:
    """Aggregate the last ``window`` keyframes' layers in the world frame."""

    def __init__(self, window: int = 10, capacity_mult=4,
                 dedup_voxel: float = 0.25, keep_layers=None,
                 transient_min_views: int = 1,
                 transient_protect_recent: int = 2,
                 transient_voxel: Optional[float] = None):
        # dedup_voxel must stay BELOW the quality evaluator's
        # thresholdDistance (0.30 m in the KITTI preset): a coarser pitch
        # systematically pushes nearest map points past the pairing
        # threshold and deflates the paired-ratio goodness that gates
        # keyframe creation (measured: 0.376 @ 0.5 m vs 0.429 @ 0.25 m on
        # an identical aligned pair).
        self.window = int(window)
        # int (uniform) or {layer: mult} — layers only used as a quality
        # reference don't need the full map density, and every extra point
        # in a target layer is O(N_src) more NN work per ICP iteration
        self.capacity_mult = capacity_mult
        self.dedup_voxel = float(dedup_voxel)
        # only layers some matcher/quality stage targets — carrying the
        # raw ingest layer (131k caps) through the map would waste HBM and
        # host aggregation time for nothing
        self.keep_layers = set(keep_layers) if keep_layers is not None else None
        # Transient (dynamic-object) suppression by multi-view consistency:
        # with min_views >= 2, a world voxel kept in the map must have been
        # observed by at least that many DISTINCT keyframes — a car moving
        # ~3 m between 3 m-spaced keyframes never revisits its own voxels,
        # while static structure seen from successive viewpoints does. The
        # newest `protect_recent` keyframes are exempt: they cover exactly
        # the fresh territory the next scans enter (dropping single-view
        # points there re-creates the async-rebuild ATE hit —
        # docs/accuracy.md). Consistency voxel defaults to 2x the dedup
        # pitch so far-range static points (sparse ring spacing) still
        # coincide across views. min_views=1 disables the filter.
        self.transient_min_views = int(transient_min_views)
        self.transient_protect_recent = int(transient_protect_recent)
        self.transient_voxel = (float(transient_voxel) if transient_voxel
                                else 2.0 * self.dedup_voxel)
        self._kfs: Deque[Tuple[Dict, Tuple[np.ndarray, np.ndarray]]] = deque(
            maxlen=self.window)
        self._caps: Dict[str, int] = {}
        # adds happen on the pipeline thread; builds may snapshot from a
        # background thread (async rebuild) — guard the deque
        self._lock = threading.Lock()

    def __len__(self) -> int:
        return len(self._kfs)

    def entries(self):
        """(layers, (R, t)) pairs snapshot — for checkpointing/async builds.
        Entry tuples are immutable; the list copy is race-free."""
        with self._lock:
            return list(self._kfs)

    def add_keyframe(self, mm: MetricMap,
                     world_pose: Tuple[np.ndarray, np.ndarray]) -> None:
        """Store a keyframe's valid points (host copies) at its world pose."""
        R = np.asarray(world_pose[0], np.float64)
        t = np.asarray(world_pose[1], np.float64)
        layers = {}
        for name, pc in mm.items():
            if self.keep_layers is not None and name not in self.keep_layers:
                continue
            m = np.asarray(pc.mask) > 0.5
            xyz = np.asarray(pc.xyz)[m]
            attrs = {k: np.asarray(v)[m] for k, v in pc.attrs.items()}
            layers[name] = (xyz, attrs)
            if name not in self._caps:
                mult = (self.capacity_mult.get(name, 1)
                        if isinstance(self.capacity_mult, dict)
                        else self.capacity_mult)
                self._caps[name] = _round_up(int(pc.capacity * mult))
        with self._lock:
            self._kfs.append((layers, (R, t)))

    def build(self, entries=None) -> MetricMap:
        """Aggregated fixed-capacity map in the world frame.

        Per layer: transform every kept keyframe into world (normals
        rotate), voxel-first dedup (never a scan-order slab), then — only
        if still over capacity — a hash-uniform subsample. Pass a
        snapshot from :meth:`entries` to build off-thread.
        """
        if entries is None:
            entries = self.entries()
        if not entries:
            raise RuntimeError("LocalMap: no keyframes added")
        names = list(entries[-1][0].keys())
        out: MetricMap = {}
        for name in names:
            xs, attr_lists = [], []
            for layers, (R, t) in entries:
                if name not in layers:
                    continue
                xyz, attrs = layers[name]
                xs.append(xyz @ R.T.astype(np.float32) + t.astype(np.float32))
                a = dict(attrs)
                if "normal" in a:
                    a = dict(a)
                    a["normal"] = a["normal"] @ R.T.astype(np.float32)
                attr_lists.append(a)
            xyz = np.concatenate(xs).astype(np.float32)
            # keys: intersection across keyframes (a resume can mix clouds
            # recorded with/without an attr); "time" is per-sweep data —
            # meaningless for an aggregated TARGET map, so drop it
            keys = set(attr_lists[0]) if attr_lists else set()
            for a in attr_lists[1:]:
                keys &= set(a)
            keys.discard("time")
            attrs = {k: np.concatenate([a[k] for a in attr_lists])
                     for k in keys}
            if (self.transient_min_views > 1
                    and len(xs) > self.transient_protect_recent):
                # distinct-keyframe view count per consistency voxel
                entry_ids = np.concatenate([
                    np.full(len(x), i, np.int64) for i, x in enumerate(xs)])
                keys = _voxel_keys64(xyz, self.transient_voxel)
                pk = np.unique(np.stack([keys, entry_ids], 1), axis=0)
                uk, views = np.unique(pk[:, 0], return_counts=True)
                v = views[np.searchsorted(uk, keys)]
                keep_pt = ((v >= self.transient_min_views)
                           | (entry_ids
                              >= len(xs) - self.transient_protect_recent))
                xyz = xyz[keep_pt]
                attrs = {k: a[keep_pt] for k, a in attrs.items()}
            keep = _voxel_first(xyz, self.dedup_voxel)
            cap = self._caps[name]
            keep = hash_subsample_np(keep, cap)
            xyz = xyz[keep]
            attrs = {k: v[keep] for k, v in attrs.items()}
            out[name] = from_points(xyz, capacity=cap, attrs=attrs)
        return out


# ---------------------------------------------------------------------------
# Device-resident build: the host build above costs ~250 ms of np.unique per
# keyframe ON THE PIPELINE THREAD at full KITTI scale (and the result is
# re-uploaded to the device). The device build keeps each keyframe's layers
# as the fixed-capacity device arrays the fused scan step already produced
# and aggregates them in ONE jitted program (transform -> voxel-first dedup
# -> hash-uniform compaction), so the rolling map never leaves HBM. At the
# KITTI operating point (3 layers, window 10, 82k-row sorts) it replaces the
# ~250 ms host build with a ~10 ms device dispatch — a requirement of the
# 10 Hz online operating point (VERDICT r2 item "hit 10 Hz online").
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("out_caps",))
def _device_build(layers, poses_R, poses_t, kf_valid, res, out_caps):
    """Aggregate stacked keyframe layers into fixed-capacity world clouds.

    ``layers``: {name: (xyz[W,C,3], mask[W,C], attrs{k: [W,C,D]})} with slot
    order oldest->newest; ``kf_valid[W]`` zeroes unused slots. Dedup keeps
    the FIRST point per ``res`` voxel in slot order (oldest keyframe wins —
    the same semantics as the host build's np.unique-first), then a
    hash-decorrelated compaction to ``out_caps[name]`` (never an input-order
    slab — CLAUDE.md invariant).
    """
    from ..filters.pipeline import _compact_uniform

    out = {}
    caps = dict(out_caps)
    for name, (xyz, mask, attrs) in layers.items():
        W, C, _ = xyz.shape
        world = jnp.einsum("wij,wnj->wni", poses_R, xyz,
                           precision="highest") + poses_t[:, None, :]
        m = (mask * kf_valid[:, None]).reshape(W * C)
        flat = world.reshape(W * C, 3)
        # padding points sit at ~1e6; masked rows sort to the trash key
        # inside lex_sort_by_voxel regardless of coordinates
        vs = voxel.lex_sort_by_voxel(flat, m, res)
        a_names = sorted(k for k in attrs if k != "time")
        avals = []
        for k in a_names:
            a = attrs[k]
            if k == "normal":
                a = jnp.einsum("wij,wnj->wni", poses_R, a,
                               precision="highest")
            avals.append(jnp.take(a.reshape(W * C, a.shape[-1]),
                                  vs.order, axis=0))
        cap = caps[name]
        mk, pts, *vals = _compact_uniform(vs.first, min(cap, W * C), vs.xyz,
                                          *avals)
        if mk.shape[0] < cap:  # fewer input rows than capacity: pad out
            pad = cap - mk.shape[0]
            mk = jnp.pad(mk, (0, pad))
            pts = jnp.pad(pts, ((0, pad), (0, 0)))
            vals = [jnp.pad(v, ((0, pad), (0, 0))) for v in vals]
        pts = jnp.where(mk[:, None] > 0.5, pts, 1e6)
        out[name] = PointCloud(pts, mk, dict(zip(a_names, vals)))
    return out


@functools.partial(jax.jit, static_argnames=("out_caps",))
def _device_build_hash(layers, poses_R, poses_t, kf_valid, res, out_caps,
                       ranks=None, inv_ranks=None):
    """Sort-free aggregate build: voxel dedup via one hash-table
    scatter-min instead of an 80k-row lexicographic device sort.

    Per layer: world-transform, spatial-hash each point's voxel cell into
    a power-of-two table of ≥4× the output capacity, ``scatter-min`` an
    age-ordered priority (``ranks[w]*C + row`` — the minimum implements
    the same oldest-wins dedup as the sort build), then compact occupied
    table slots to capacity. Slot order is the hash — pseudo-random in
    space — so the over-capacity truncation is hash-uniform, never a
    spatial slab (CLAUDE.md invariant).

    ``ranks``/``inv_ranks`` (i32[W], inverse permutations) order the W
    stacked slots by keyframe age for the incremental ring-buffer path
    (slot index no longer equals age order after wrap-around); omitted =
    slots are already oldest-first.

    Differences vs :func:`_device_build` (measured ATE-neutral on the
    500-scan HDL-64 replay, docs/accuracy.md): two *different* voxels
    that collide in the table keep only one point (expected loss
    n_vox²/2T ≈ a few % at 4× headroom), and within a voxel the kept
    point is the oldest keyframe's first row in scan order rather than
    in voxel-sort order. TPU cost: one 82k-element scatter + cumsum
    compaction vs the lex-sort build's 209 ms/KF on v5e — the map
    rebuild leaves the 10 Hz scan budget entirely.
    """
    from ..filters.pipeline import _compact

    BIG = jnp.iinfo(jnp.int32).max
    out = {}
    caps = dict(out_caps)
    for name, (xyz, mask, attrs) in layers.items():
        W, C, _ = xyz.shape
        world = jnp.einsum("wij,wnj->wni", poses_R, xyz,
                           precision="highest") + poses_t[:, None, :]
        m = (mask * kf_valid[:, None]).reshape(W * C)
        flat = world.reshape(W * C, 3)
        cap = caps[name]
        T = 1 << max(int(cap * 4 - 1).bit_length(), 8)
        cell = jnp.floor(flat / res).astype(jnp.int32)
        h = ((cell[:, 0] * np.int32(73856093))
             ^ (cell[:, 1] * np.int32(19349663))
             ^ (cell[:, 2] * np.int32(83492791)))
        slot = jnp.bitwise_and(h, T - 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (W, C), 1)
        if ranks is None:
            pri_all = (jax.lax.broadcasted_iota(jnp.int32, (W, C), 0) * C
                       + row_iota)
        else:
            pri_all = ranks[:, None] * C + row_iota
        pri = jnp.where(m > 0.5, pri_all.reshape(W * C), BIG)
        table = jnp.full((T,), BIG, jnp.int32).at[slot].min(
            pri, mode="drop", indices_are_sorted=False, unique_indices=False)
        occ = table < BIG
        win = jnp.where(occ, table, 0)
        if inv_ranks is None:
            rowidx = win
        else:  # priority -> (rank, row) -> flat slot-major row index
            rowidx = jnp.take(inv_ranks, win // C) * C + win % C
        pts = jnp.take(flat, rowidx, axis=0)
        a_names = sorted(k for k in attrs if k != "time")
        avals = []
        for k in a_names:
            a = attrs[k]
            if k == "normal":
                a = jnp.einsum("wij,wnj->wni", poses_R, a,
                               precision="highest")
            avals.append(jnp.take(a.reshape(W * C, a.shape[-1]),
                                  rowidx, axis=0))
        mk, pts, *vals = _compact(occ.astype(jnp.float32), cap, pts, *avals)
        pts = jnp.where(mk[:, None] > 0.5, pts, 1e6)
        out[name] = PointCloud(pts, mk, dict(zip(a_names, vals)))
    return out


class DeviceLocalMap:
    """Drop-in :class:`LocalMap` variant whose build runs on device.

    Keyframe layers are stored as the (already device-resident) padded
    arrays — add_keyframe is a reference append, no host copies. The
    aggregate lives in HBM and is consumed directly by the fused scan step.
    Transient (multi-view) suppression is not implemented here; the
    front-end falls back to the host builder when ``local_map_min_views > 1``.

    ``mode="sort"`` is the exact lex-sort dedup; ``mode="hash"`` the
    sort-free scatter build (see :func:`_device_build_hash`).
    """

    def __init__(self, window: int = 10, capacity_mult=4,
                 dedup_voxel: float = 0.25, keep_layers=None,
                 mode: str = "sort"):
        self.window = int(window)
        self.capacity_mult = capacity_mult
        self.dedup_voxel = float(dedup_voxel)
        self.keep_layers = set(keep_layers) if keep_layers is not None else None
        if mode not in ("sort", "hash"):
            raise ValueError(f"unknown DeviceLocalMap mode {mode!r}")
        self.mode = mode
        self._kfs: Deque[Tuple[Dict, Tuple[np.ndarray, np.ndarray]]] = deque(
            maxlen=self.window)
        self._caps: Dict[str, int] = {}
        self._lock = threading.Lock()
        # incremental ring buffer (hash mode): the W keyframe layers stay
        # STACKED on device ({name: (xyz[W,C,3], mask[W,C], attrs)}) and
        # add_keyframe updates ONE slot (a W*C-row device copy) instead of
        # build() restacking all W entries every keyframe — the restack
        # was ~half the measured build latency. slot = seq % W; the build
        # passes age ranks so oldest-wins dedup survives wrap-around.
        self._ring = None
        self._ring_slot_seq = np.full(self.window, -1, np.int64)
        self._ring_poses_R = np.tile(np.eye(3, dtype=np.float32),
                                     (self.window, 1, 1))
        self._ring_poses_t = np.zeros((self.window, 3), np.float32)
        self._seq = 0

    def __len__(self) -> int:
        return len(self._kfs)

    def entries(self):
        with self._lock:
            return list(self._kfs)

    def _ring_update(self, layers: Dict) -> None:
        """Fold one keyframe's layers into the device-stacked ring."""
        attrs_of = lambda pc: {k: pc.attrs[k] for k in sorted(pc.attrs)
                               if k != "time"}
        if self._ring is not None:
            ok = set(self._ring) == set(layers) and all(
                self._ring[n][0].shape[1:] == layers[n].xyz.shape
                and set(self._ring[n][2]) == set(attrs_of(layers[n]))
                for n in layers)
            if not ok:  # layer structure changed: restart the ring
                self._ring = None
                self._ring_slot_seq.fill(-1)
        slot = self._seq % self.window
        if self._ring is None:
            W = self.window
            self._ring = {
                n: (jnp.broadcast_to(pc.xyz, (W, *pc.xyz.shape)),
                    jnp.zeros((W, pc.mask.shape[0]), pc.mask.dtype),
                    {k: jnp.broadcast_to(v, (W, *v.shape))
                     for k, v in attrs_of(pc).items()})
                for n, pc in layers.items()}
        ring = {}
        for n, pc in layers.items():
            xyz, mask, attrs = self._ring[n]
            ring[n] = (xyz.at[slot].set(pc.xyz),
                       mask.at[slot].set(pc.mask),
                       {k: v.at[slot].set(pc.attrs[k])
                        for k, v in attrs.items()})
        self._ring = ring
        self._ring_slot_seq[slot] = self._seq

    def add_keyframe(self, mm: MetricMap,
                     world_pose: Tuple[np.ndarray, np.ndarray]) -> None:
        R = np.asarray(world_pose[0], np.float32)
        t = np.asarray(world_pose[1], np.float32)
        layers = {}
        for name, pc in mm.items():
            if self.keep_layers is not None and name not in self.keep_layers:
                continue
            layers[name] = pc
            if name not in self._caps:
                mult = (self.capacity_mult.get(name, 1)
                        if isinstance(self.capacity_mult, dict)
                        else self.capacity_mult)
                self._caps[name] = _round_up(int(pc.capacity * mult))
        with self._lock:
            self._kfs.append((layers, (R, t)))
            if self.mode == "hash":
                slot = self._seq % self.window
                self._ring_update(layers)
                self._ring_poses_R[slot] = R
                self._ring_poses_t[slot] = t
                self._seq += 1

    def build(self, entries=None) -> MetricMap:
        if entries is None and self.mode == "hash":
            with self._lock:
                ring, slot_seq = self._ring, self._ring_slot_seq.copy()
                poses_R = self._ring_poses_R.copy()
                poses_t = self._ring_poses_t.copy()
            if ring is not None:
                # age ranks: oldest live slot -> rank 0; dead slots last
                order = np.argsort(np.where(slot_seq < 0,
                                            np.iinfo(np.int64).max,
                                            slot_seq))
                ranks = np.empty(self.window, np.int32)
                ranks[order] = np.arange(self.window, dtype=np.int32)
                inv = order.astype(np.int32)
                kf_valid = (slot_seq >= 0).astype(np.float32)
                names = sorted(ring)
                out_caps = tuple(sorted((n, self._caps[n]) for n in names))
                return _device_build_hash(
                    ring, jnp.asarray(poses_R), jnp.asarray(poses_t),
                    jnp.asarray(kf_valid), jnp.float32(self.dedup_voxel),
                    out_caps, jnp.asarray(ranks), jnp.asarray(inv))
        if entries is None:
            entries = self.entries()
        if not entries:
            raise RuntimeError("DeviceLocalMap: no keyframes added")
        W = self.window
        names = [n for n in entries[-1][0].keys()]
        # fixed W slots (one compile): real entries oldest-first, then the
        # last entry repeated with kf_valid=0 (shape filler, fully masked)
        slots = list(entries) + [entries[-1]] * (W - len(entries))
        kf_valid = jnp.asarray(
            [1.0] * len(entries) + [0.0] * (W - len(entries)), jnp.float32)
        poses_R = jnp.stack([jnp.asarray(R, jnp.float32)
                             for _, (R, _) in slots])
        poses_t = jnp.stack([jnp.asarray(t, jnp.float32)
                             for _, (_, t) in slots])
        layers = {}
        for name in names:
            pcs = [lay[name] for lay, _ in slots]
            # attr keys: intersection across entries (a resume can mix
            # clouds recorded with/without an attr); "time" is per-sweep
            # data, dropped inside the build
            keys = set(pcs[0].attrs)
            for pc in pcs[1:]:
                keys &= set(pc.attrs)
            layers[name] = (
                jnp.stack([pc.xyz for pc in pcs]),
                jnp.stack([pc.mask for pc in pcs]),
                {k: jnp.stack([pc.attrs[k] for pc in pcs]) for k in keys},
            )
        out_caps = tuple(sorted((n, self._caps[n]) for n in names))
        build = _device_build_hash if self.mode == "hash" else _device_build
        return build(layers, poses_R, poses_t, kf_valid,
                     jnp.float32(self.dedup_voxel), out_caps)
