"""Cohort driver: batched, sharded, resumable multi-subject analysis.

Replaces the reference's one-subject-at-a-time GUI loop
(Vent_Analysis.py:856-864 keeps a single mutable Vent1) with a manifest-based
batch runner (SURVEY.md §5 checkpoint/resume):

- a manifest (JSON list of {"id", "xenon", "mask", "proton"?}) names the
  cohort;
- subjects are decoded host-side, stacked into padded [N,H,W,D] batches, and
  analyzed by the fused pipeline sharded over the device mesh;
- per-subject outputs (6-channel NIfTI + metrics JSON) are written with
  done-markers, so a rerun skips completed subjects;
- a corrupt subject poisons only its own lane (valid=False in its metrics).
"""
from __future__ import annotations

import json
import logging
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, List, Optional, Tuple

log = logging.getLogger("ventjax.cohort")

import numpy as np
import jax
import jax.numpy as jnp

from ventjax.config import DEFAULT_CONFIG, VentConfig
from ventjax.dist import make_batch_mesh, shard_cohort_fn
from ventjax.io import dicom as dcm
from ventjax.pipeline.analyze import analyze_cohort, build_geometry
from ventjax.report import export as rexport


def load_manifest(path: str) -> List[Dict]:
    with open(path) as f:
        subjects = json.load(f)
    if not isinstance(subjects, list):
        raise ValueError("manifest must be a JSON list of subject dicts")
    return subjects


def _decode_mask_folder_fast(folder: str) -> Optional[np.ndarray]:
    """Native per-slice decode of the mask folder (the reference's ingest hot
    loop, SURVEY.md §3.1); None -> fall back to the Python codec."""
    from ventjax.io import native

    if not native.available():
        return None
    files = [f for f in sorted(os.listdir(folder)) if f.endswith(".dcm")]
    if not files:
        return None
    slices = []
    for fname in files:
        r = native.decode_pixels(os.path.join(folder, fname))
        if r is None:
            return None
        slices.append(r[0])
    return np.stack(slices, axis=-1).astype(np.float64)


def _decode_subject(entry: Dict) -> Tuple[Optional[np.ndarray], ...]:
    """Host-side DICOM decode for one subject; None signals a decode error."""
    try:
        ds, hp = dcm.open_single_dicom(entry["xenon"])
        mask = _decode_mask_folder_fast(entry["mask"])
        if mask is None:
            _, mask = dcm.open_dicom_folder(entry["mask"])
        vox = None
        for k in range(100):
            try:
                vox = list(ds[(0x5200, 0x9230)][k]["PixelMeasuresSequence"][0]
                           .PixelSpacing)
                break
            except Exception:
                continue
        if vox is None and "PixelSpacing" in ds:
            vox = list(ds.PixelSpacing)
        vox = [float(vox[0]), float(vox[1]), float(ds.SpacingBetweenSlices)]
        return hp.astype(np.float32), mask.astype(np.float32), tuple(vox), ds
    except Exception:
        return None, None, None, None


def run_cohort(
    manifest: List[Dict],
    out_dir: str,
    config: VentConfig = DEFAULT_CONFIG,
    batch_size: Optional[int] = None,
    use_mesh: bool = True,
    resume: bool = True,
    decode_workers: int = 8,
    progress: Optional[Callable[[str, int, int], None]] = None,
) -> List[Dict]:
    """Analyze every subject in the manifest; returns per-subject metrics.

    `progress(stage, done, total)` is called after decode and after each
    device batch (the observability hook, SURVEY.md §5 metrics/logging).
    """
    os.makedirs(out_dir, exist_ok=True)
    todo = []
    results: List[Dict] = []
    for entry in manifest:
        sid = entry["id"]
        done_marker = os.path.join(out_dir, sid, ".done")
        if resume and os.path.exists(done_marker):
            with open(os.path.join(out_dir, sid, "metrics.json")) as f:
                results.append(json.load(f))
            continue
        todo.append(entry)
    if not todo:
        return results

    # Overlapped host-side decode (the reference's per-slice dcmread loop is
    # its ingest hot spot, SURVEY.md §3.1) feeding device batches.
    log.info("decoding %d subjects (%d workers)", len(todo), decode_workers)
    with ThreadPoolExecutor(max_workers=decode_workers) as pool:
        decoded = list(pool.map(_decode_subject, todo))
    if progress:
        progress("decode", len(decoded), len(todo))

    ok_idx = [i for i, d in enumerate(decoded) if d[0] is not None]
    if ok_idx:
        shapes = {decoded[i][0].shape for i in ok_idx}
        voxes = {decoded[i][2] for i in ok_idx}
        if len(shapes) > 1 or len(voxes) > 1:
            raise ValueError(
                f"cohort mixes volume shapes {shapes} / voxel sizes {voxes}; "
                "split the manifest per geometry"
            )
        shape = next(iter(shapes))
        vox = next(iter(voxes))
        # Data-driven N4 pad bucket (8k granularity, never above the
        # configured ceiling); overflow is still flagged per subject.
        max_mask = max(int((decoded[i][1] > 0).sum()) for i in ok_idx)
        pad = min(config.n4_mask_pad, -(-max_mask // 8192) * 8192)
        config = config.replace(n4_mask_pad=pad)
        geom = build_geometry(vox, shape, config)

        n_dev = len(jax.devices()) if use_mesh else 1
        bs = batch_size or max(n_dev, 8)
        bs = -(-bs // n_dev) * n_dev  # divisible by mesh size
        fn = lambda h, m: analyze_cohort(h, m, geom, config)
        if use_mesh and n_dev > 1:
            fn = shard_cohort_fn(fn, make_batch_mesh())
        fn = jax.jit(fn)

        for start in range(0, len(ok_idx), bs):
            chunk = ok_idx[start:start + bs]
            pad = bs - len(chunk)
            hp = np.stack([decoded[i][0] for i in chunk]
                          + [np.zeros(shape, np.float32)] * pad)
            mask = np.stack([decoded[i][1] for i in chunk]
                            + [np.zeros(shape, np.float32)] * pad)
            res = fn(jnp.asarray(hp), jnp.asarray(mask))
            for lane, i in enumerate(chunk):
                entry = todo[i]
                _write_subject(
                    out_dir, entry, decoded[i],
                    jax.tree_util.tree_map(lambda x: x[lane], res),
                    results,
                )
            log.info("analyzed %d/%d subjects", start + len(chunk), len(ok_idx))
            if progress:
                progress("analyze", start + len(chunk), len(ok_idx))

    for i, d in enumerate(decoded):
        if d[0] is None:
            entry = todo[i]
            metrics = {"id": entry["id"], "valid": False,
                       "error": "decode_failed"}
            sdir = os.path.join(out_dir, entry["id"])
            os.makedirs(sdir, exist_ok=True)
            with open(os.path.join(sdir, "metrics.json"), "w") as f:
                json.dump(metrics, f, indent=2)
            results.append(metrics)
    return results


def _write_subject(out_dir, entry, decoded, res, results) -> None:
    hp, mask, vox, ds = decoded
    sid = entry["id"]
    sdir = os.path.join(out_dir, sid)
    os.makedirs(sdir, exist_ok=True)
    metrics = {"id": sid, **res.metrics.as_dict()}
    rexport.export_nifti(
        sdir, sid, hp, mask,
        n4=np.asarray(res.n4), defect=np.asarray(res.defect),
        ci=np.asarray(res.ci_map),
    )
    with open(os.path.join(sdir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    if ds is not None:
        rexport.dicom_to_json(ds, os.path.join(sdir, f"{sid}.json"))
    with open(os.path.join(sdir, ".done"), "w") as f:
        f.write("ok\n")
    results.append(metrics)
