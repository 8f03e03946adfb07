"""Result pytrees for the fused pipeline.

StudyMetrics mirrors the scientific keys of the reference's 23-key metadata
dict (Vent_Analysis.py:78-103) one-to-one — SNR, VDP, VDP_lb, VDP_km,
LungVolume, DefectVolume, CI — as device scalars; the host-side report layer
merges them with the patient/study string fields when exporting the same JSON
schema.  Extra quality flags (ci_saturated, ci_overflow, valid) implement the
per-subject error isolation the reference lacks (SURVEY.md §5 failure
detection): a bad subject taints its own lane, never the cohort.
"""
from __future__ import annotations

import dataclasses

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class StudyMetrics:
    snr: jax.Array
    vdp: jax.Array
    vdp_lb: jax.Array
    vdp_km: jax.Array
    lung_volume: jax.Array      # liters
    defect_volume: jax.Array    # liters
    ci: jax.Array               # mm (95th pct of CI map over defect voxels)
    ci_saturated: jax.Array     # count of voxels clamped at Rmax
    ci_overflow: jax.Array      # bool: defect voxels exceeded static pad
    n4_overflow: jax.Array      # bool: masked voxels exceeded the N4 pad
    valid: jax.Array            # bool: subject had a nonempty mask

    def as_dict(self) -> dict:
        """Reference-metadata-compatible key mapping (host-side floats)."""
        return {
            "SNR": float(self.snr),
            "VDP": float(self.vdp),
            "VDP_lb": float(self.vdp_lb),
            "VDP_km": float(self.vdp_km),
            "LungVolume": float(self.lung_volume),
            "DefectVolume": float(self.defect_volume),
            "CI": float(self.ci),
            "CI_saturated_voxels": int(self.ci_saturated),
            "CI_overflow": bool(self.ci_overflow),
            "N4_overflow": bool(self.n4_overflow),
            "valid": bool(self.valid),
        }


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class VentResult:
    """Device-side study outputs (one subject, or batched along axis 0).

    Channel correspondence with the reference's 4-D export array
    (Vent_Analysis.py:292-313): hp->[1], mask->[2], n4->[3], defect->[4],
    ci->[5]; proton->[0] is carried by the host I/O layer.
    """
    n4: jax.Array
    defect: jax.Array
    defect_lb: jax.Array
    defect_km: jax.Array
    defect_border: jax.Array
    ci_map: jax.Array
    metrics: StudyMetrics
    # Optional compact-transfer extras (analyze_study(export_compact=True)):
    # {"n4_cv": [P] f32 dense-n4 values at the mask-compaction indices,
    #  "phi": [L] f32 concatenated B-spline lattices (ops.n4.n4_phi_sizes)}.
    # Defect is NOT carried here — it travels as its own <=K compaction
    # indices in the cohort pack, because the 3x3 median can switch ON
    # boundary voxels OUTSIDE the mask (mask-index flags cannot encode
    # it; see pipeline/analyze.py).  The host rebuilds the dense n4
    # channel from these plus its own hp/mask
    # (pipeline/cohort._rebuild_compact_pack) instead of shipping a dense
    # volume over the device->host link.
    export: dict = None
