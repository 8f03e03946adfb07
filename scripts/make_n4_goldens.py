"""Generate SimpleITK N4 golden outputs (run OFFLINE where SimpleITK exists).

This build environment cannot install SimpleITK, so the goldens are produced
on any machine that has it (`pip install SimpleITK numpy`) and checked in:

    python scripts/make_n4_goldens.py tests/goldens/n4_itk.npz

tests/test_n4_goldens.py picks the file up automatically and asserts the
from-scratch oracle (ventjax/oracle/n4_oracle.py) and the device op
(ventjax/ops/n4.py) against the real ITK filter's output: field correlation
> 0.999 and downstream |dVDP| < 0.1pp, per SURVEY.md §7 step 4 /
docs/N4_ITK_AUDIT.md.

The phantom construction below is deterministic and identical to
ventjax.io.phantom.make_phantom, so the .npz only needs to carry the ITK
outputs, not the inputs.
"""
import sys

import numpy as np


GEOMETRIES = [
    ((64, 64, 8), (1.5, 1.5, 10.0), 0),
    ((128, 128, 16), (1.5, 1.5, 10.0), 3),
    ((128, 128, 16), (2.0, 2.0, 11.5), 7),
]


def main(out_path: str) -> None:
    import SimpleITK as sitk  # noqa: only available offline

    sys.path.insert(0, ".")
    from ventjax.io.phantom import make_phantom

    arrays = {}
    for i, (shape, vox, seed) in enumerate(GEOMETRIES):
        ph = make_phantom(shape=shape, vox=vox, seed=seed)
        image = sitk.GetImageFromArray(np.asarray(ph.hp, np.float32))
        mask = sitk.GetImageFromArray(np.asarray(ph.mask, np.uint8))
        corrector = sitk.N4BiasFieldCorrectionImageFilter()
        corrected = sitk.GetArrayFromImage(corrector.Execute(image, mask))
        arrays[f"g{i}_corrected"] = corrected
        arrays[f"g{i}_meta"] = np.asarray([*shape, *vox, seed])
    np.savez_compressed(out_path, **arrays)
    print(f"wrote {out_path} ({len(GEOMETRIES)} geometries)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "tests/goldens/n4_itk.npz")
