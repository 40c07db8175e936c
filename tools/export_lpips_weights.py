"""Export LPIPS(VGG) weights to the npz contract of train/lpips.py.

Run on any machine that has torchvision and the `lpips` package installed
(this image has neither — LPIPS weights are not redistributable here):

    python tools/export_lpips_weights.py weights/lpips_vgg.npz

Key contract (all float32):
  conv{b}_{i}/kernel  [3, 3, cin, cout]   HWIO (transposed from torch OIHW)
  conv{b}_{i}/bias    [cout]
  lin{k}/weight       [C_k]               non-negative 1x1 calibration
                                           weights, k indexes the taps
                                           relu1_2,2_2,3_3,4_3,5_3

Sources: torchvision `vgg16(weights=IMAGENET1K_V1).features` for the convs;
`lpips.LPIPS(net='vgg').lins[k].model[-1].weight` for the calibration
(matching the reference's evaluator, `/root/reference/utils/eval.py:24-64`).
"""

import sys

import numpy as np


def main(out_path: str):
    import lpips as lpips_pkg  # type: ignore
    import torchvision  # type: ignore

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from outdoor_nerf_depth_tpu.train.lpips import (
        EXPORT_PROVENANCE,
        VGG16_CONVS,
        save_weights,
    )

    vgg = torchvision.models.vgg16(
        weights=torchvision.models.VGG16_Weights.IMAGENET1K_V1
    ).features
    convs = [m for m in vgg if m.__class__.__name__ == "Conv2d"]
    assert len(convs) == len(VGG16_CONVS)
    weights = {}
    for (name, cout, _), conv in zip(VGG16_CONVS, convs):
        w = conv.weight.detach().numpy()  # [cout, cin, kh, kw]
        assert w.shape[0] == cout
        weights[f"{name}/kernel"] = np.transpose(w, (2, 3, 1, 0))
        weights[f"{name}/bias"] = conv.bias.detach().numpy()

    net = lpips_pkg.LPIPS(net="vgg")
    for k, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        weights[f"lin{k}/weight"] = np.clip(w[0, :, 0, 0], 0.0, None)

    save_weights(out_path, weights, provenance=EXPORT_PROVENANCE)
    print(f"wrote {out_path} ({len(weights)} arrays, provenance-stamped)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "weights/lpips_vgg.npz")
