"""Measure the PyTorch reference's training throughput on this host.

Runs the reference's own modules in place (imported from /root/reference,
never copied) through one full NeRFModel-style training step — stratified
sampling, coarse MLP, volume render, PDF resampling, fine MLP, MSE loss,
backward, Adam step — at the nerf-synthetic-lego workload (2048 rays,
64+128 samples, two 8x256 FlexibleNeRFModels), on CPU (the only hardware
both stacks share; the reference repo publishes no absolute numbers, see
BASELINE.md). Writes BASELINE_MEASURED.json consumed by bench.py.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo/tests")

import numpy as np
import torch

from refload import ref_models, ref_modules, ref_model_helpers


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def main():
    torch.manual_seed(0)
    m = ref_modules()
    models = ref_models()
    mh = ref_model_helpers()

    R, NC, NF = 2048, 64, 128
    kwargs = dict(
        num_layers=8, hidden_size=256, skip_step=4,
        num_encoding_fn_xyz=10, num_encoding_fn_dir=4, use_viewdirs=True,
    )
    coarse = models.FlexibleNeRFModel(**kwargs)
    fine = models.FlexibleNeRFModel(**kwargs)
    sampler = m.RaySampleInterval(NC)
    sample_pdf = m.SamplePDF(NF)
    renderer = m.VolumeRenderer(0.2, 0.0, False, attenuation_threshold=1e-5)
    renderer.train(True)
    opt = torch.optim.Adam(list(coarse.parameters()) + list(fine.parameters()), lr=5e-3)
    cfg_mode = _NS(lindisp=False, perturb=True)

    rng = np.random.default_rng(0)
    dirs = torch.from_numpy(
        rng.standard_normal((R, 3)).astype(np.float32)
    )
    dirs = dirs / dirs.norm(dim=-1, keepdim=True)
    origins = torch.zeros(R, 3)
    targets = torch.rand(R, 3)
    near, far = torch.tensor(2.0), torch.tensor(6.0)

    def step():
        opt.zero_grad()
        intervals = sampler(cfg_mode, R, near, far)
        pts = mh.intervals_to_ray_points(intervals, dirs, origins)
        exp_dirs = dirs[..., None, :].expand_as(pts)
        cb = renderer(coarse(pts, exp_dirs), intervals, dirs)
        fi = sample_pdf(intervals, cb.weights, 1.0)
        pts = mh.intervals_to_ray_points(fi, dirs, origins)
        exp_dirs = dirs[..., None, :].expand_as(pts)
        fb = renderer(fine(pts, exp_dirs), fi, dirs)
        loss = torch.nn.functional.mse_loss(cb.rgb_map, targets) + \
            torch.nn.functional.mse_loss(fb.rgb_map, targets)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    n = 3
    t0 = time.time()
    for _ in range(n):
        step()
    elapsed = time.time() - t0

    out = {
        "workload": "lego: 2048 rays, 64+128 samples, 2x FlexibleNeRF 8x256",
        "hardware": f"cpu ({torch.get_num_threads()} threads)",
        "steps_per_sec": n / elapsed,
        "train_rays_per_sec": n * R / elapsed,
        "torch_version": torch.__version__,
    }
    with open("/root/repo/BASELINE_MEASURED.json", "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
