"""CLI: convert a pip ``lpips`` VGG checkpoint to this framework's .npz.

    python -m my_depthsplat_tpu.convert.lpips_cli lpips_vgg.pth lpips_vgg.npz

The input is the state dict of ``lpips.LPIPS(net='vgg')`` (torch), i.e. the
net the reference uses for both the perceptual loss
(src/loss/loss_lpips.py:27-33) and the eval metric (src/evaluation/
metrics.py:22-35). Obtain it with::

    import torch, lpips
    torch.save(lpips.LPIPS(net='vgg').state_dict(), 'lpips_vgg.pth')

Output .npz schema (consumed by train.lpips_io.load_lpips_params — flat
'/'-joined param paths of train.lpips_net.LPIPS):

    params/vgg/conv{S}_{C}/kernel   (3, 3, C_in, C_out) f32  HWIO conv kernel
    params/vgg/conv{S}_{C}/bias     (C_out,) f32
    params/lin{S}                   (C_S, 1) f32   1x1 head weights per stage

with S = 0..4 the VGG stages (relu1_2 .. relu5_3: channels 64, 128, 256,
512, 512) and C the conv index within the stage (2, 2, 3, 3, 3 convs).
Key mapping from torch: ``net.slice{S+1}.{torchvision_idx}`` -> conv{S}_{C}
(kernels transposed OIHW -> HWIO) and ``lin{S}.model.1.weight`` (1, C, 1, 1)
-> lin{S} reshaped (C, 1). The conversion is validated by
tests/test_lpips.py::test_lpips_convert_golden (a frozen tiny checkpoint
whose LPIPS value is recomputed independently in numpy).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", type=Path, help="torch lpips state dict (.pth/.pt)")
    ap.add_argument("dst", type=Path, help="output .npz path")
    args = ap.parse_args()

    import torch

    from ..train.lpips_io import save_lpips_params
    from .torch_weights import convert_lpips

    # LPIPS state dicts are plain tensors; never execute checkpoint pickles.
    sd = torch.load(args.src, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    params = convert_lpips(sd)
    save_lpips_params(args.dst, params)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
