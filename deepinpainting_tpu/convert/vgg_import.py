"""One-time torchvision-VGG16 -> npz weight converter.

The reference loads `torchvision.models.vgg16(pretrained=True)` at model
construction (models/vgg16.py:9).  This environment has no torchvision and
no network egress, so pretrained weights enter via a file: run this
converter once wherever torchvision weights exist (a downloaded
`vgg16-397923af.pth` state_dict or a pickled model), commit/ship the npz,
and point `Config.vgg_weights` at it.  Without the npz the extractor runs
with deterministic random weights (models/vgg16.py here) — fine for every
structural test, required-for-parity only at eval time.

Layout: torchvision keys `features.{idx}.weight` [O,I,3,3] ->
`{name}_kernel` HWIO + `{name}_bias`, for the ten convs feeding the four
slices (features indices 0,2,5,7,10,12,14,17,19,21 — the reference slices
stop at index 23, models/vgg16.py:13-20).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# torchvision vgg16 `features` conv indices -> our slice names
VGG16_FEATURES_INDEX = {
    0: "conv1_1", 2: "conv1_2",
    5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
}


def convert_vgg16_state_dict(state_dict: Dict[str, "np.ndarray"]
                             ) -> Dict[str, np.ndarray]:
    """torch state_dict (tensors or arrays) -> flat npz dict.

    Accepts either bare `features.N.*` keys (torchvision state_dict file)
    or `vgg.features.N.*` style prefixes.
    """
    out: Dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        parts = key.split(".")
        if "features" not in parts:
            continue
        fi = parts.index("features")
        idx = int(parts[fi + 1])
        kind = parts[fi + 2]
        name = VGG16_FEATURES_INDEX.get(idx)
        if name is None:
            continue  # conv5_* and classifier weights are unused
        arr = np.asarray(getattr(value, "numpy", lambda: value)()
                         if hasattr(value, "numpy") else value,
                         dtype=np.float32)
        if kind == "weight":
            # OIHW -> HWIO
            out[name + "_kernel"] = arr.transpose(2, 3, 1, 0)
        elif kind == "bias":
            out[name + "_bias"] = arr
    missing = [f"{n}_{k}" for n in VGG16_FEATURES_INDEX.values()
               for k in ("kernel", "bias") if f"{n}_{k}" not in out]
    if missing:
        raise ValueError(f"state_dict is missing VGG16 convs: {missing}")
    return out


def torch_file_to_npz(pth_path: str, npz_path: str) -> None:
    """Convert a .pth file (state_dict, or module with .state_dict())."""
    import torch

    obj = torch.load(pth_path, map_location="cpu", weights_only=False)
    state_dict = obj.state_dict() if hasattr(obj, "state_dict") else obj
    state_dict = {k: v.detach().cpu() for k, v in state_dict.items()}
    np.savez(npz_path, **convert_vgg16_state_dict(state_dict))


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pth", help="torchvision vgg16 .pth (state_dict)")
    ap.add_argument("npz", help="output .npz path")
    args = ap.parse_args(argv)
    torch_file_to_npz(args.pth, args.npz)
    print(f"wrote {args.npz}")


if __name__ == "__main__":
    main()
