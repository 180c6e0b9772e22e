"""End-to-end training parity vs the torch reference (VERDICT r1 item 1).

Two levels:
1. Gradient parity: one full forward+backward of the hierarchical
   pipeline (sampler -> coarse -> render -> PDF -> fine -> summed MSE)
   from transplanted weights on an identical batch — losses and weight
   gradients must agree to float precision. This is the exact-semantics
   claim; op-level parity tests cannot catch a mis-wired composition.
2. Trajectory quality parity (slow, ~2-3 min): both stacks train on the
   SAME precomputed batches from the SAME initial weights in the shipped
   stochastic regime (perturb + sigma noise 0.2); the rebuild's final
   held-out PSNR must be at least the reference's minus a tolerance.
   (Step-level weight parity is impossible: Adam's first-step updates are
   sign(g)-like, and |g| ~ 1e-10 sign flips send trajectories apart; the
   deterministic regime is also violently seed-sensitive for the
   reference itself — 24.4/16.3/11.6 dB across torch seeds 0/1/2 at 500
   steps. See scripts/parity_trajectory.py for the full-size runs.)
"""

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "parity_trajectory",
    Path(__file__).resolve().parent.parent / "scripts" / "parity_trajectory.py",
)
pt = importlib.util.module_from_spec(_spec)
sys.modules["parity_trajectory"] = pt
_spec.loader.exec_module(pt)


def test_e2e_gradient_parity():
    import torch
    import jax
    import jax.numpy as jnp

    from refload import ref_model_helpers, ref_models, ref_modules
    from test_models import _transplant_flexible

    from nerfmeshes_tpu.models.nerf_models import FlexibleNeRFModel
    from nerfmeshes_tpu.ops.math import img2mse
    from nerfmeshes_tpu.train.render import RenderSettings, render_rays

    batches, _ = pt.make_batches(1, 96)
    o, d, t = batches[0]

    torch.manual_seed(0)
    m = ref_modules()
    models = ref_models()
    mh = ref_model_helpers()
    coarse_t = models.FlexibleNeRFModel(**pt.ARCH)
    fine_t = models.FlexibleNeRFModel(**pt.ARCH)
    sampler = m.RaySampleInterval(pt.NUM_COARSE)
    sample_pdf = m.SamplePDF(pt.NUM_FINE)
    renderer = m.VolumeRenderer(0.0, 0.0, False, attenuation_threshold=1e-5)

    class _NS:
        lindisp = False
        perturb = False

    ot, dt, tt = map(torch.from_numpy, (o, d, t))
    intervals = sampler(_NS(), dt.shape[0], torch.tensor(pt.NEAR), torch.tensor(pt.FAR))
    pts = mh.intervals_to_ray_points(intervals, dt, ot)
    cb = renderer(coarse_t(pts, dt[..., None, :].expand_as(pts)), intervals, dt)
    fi = sample_pdf(intervals, cb.weights, 0.0)
    pts2 = mh.intervals_to_ray_points(fi, dt, ot)
    fb = renderer(fine_t(pts2, dt[..., None, :].expand_as(pts2)), fi, dt)
    ref_loss = torch.nn.functional.mse_loss(cb.rgb_map, tt) + \
        torch.nn.functional.mse_loss(fb.rgb_map, tt)
    ref_loss.backward()

    coarse = FlexibleNeRFModel(**pt.ARCH)
    fine = FlexibleNeRFModel(**pt.ARCH)
    pz = jnp.zeros((2, 2, 3))
    params = {
        "coarse": _transplant_flexible(
            coarse.init(jax.random.key(0), pz, pz), coarse_t, True,
            pt.ARCH["num_layers"],
        ),
        "fine": _transplant_flexible(
            fine.init(jax.random.key(1), pz, pz), fine_t, True,
            pt.ARCH["num_layers"],
        ),
    }
    settings = RenderSettings(
        num_coarse=pt.NUM_COARSE, num_fine=pt.NUM_FINE, perturb=False,
        lindisp=False, radiance_field_noise_std=0.0, white_background=False,
        use_fine=True, use_fused_kernel=False,
    )

    def loss_fn(p):
        cbj, fbj = render_rays(
            coarse, fine, p, jnp.asarray(o), jnp.asarray(d), pt.NEAR, pt.FAR,
            settings, train=True,
        )
        return img2mse(cbj.rgb_map, jnp.asarray(t)) + img2mse(fbj.rgb_map, jnp.asarray(t))

    our_loss, grads = jax.value_and_grad(loss_fn)(params)
    assert abs(float(our_loss) - float(ref_loss)) < 1e-5 * max(float(ref_loss), 1e-3)

    # Every weight gradient, both networks.
    def check(flax_side, torch_model, num_layers):
        layers = [torch_model.layer1, *torch_model.layers_xyz,
                  torch_model.fc_feat, torch_model.fc_alpha,
                  torch_model.layers_dir[0], torch_model.fc_rgb]
        for i, lyr in enumerate(layers):
            gk = np.asarray(flax_side["params"][f"TorchLinear_{i}"]["kernel"])
            gt = lyr.weight.grad.numpy().T
            # Absolute tolerance scaled to the layer's gradient magnitude
            # (rtol=0: tiny elements carry f32 accumulation noise).
            scale = max(np.abs(gt).max(), 1e-8)
            np.testing.assert_allclose(gk, gt, rtol=0, atol=2e-6 * scale + 1e-8)
            gb = np.asarray(flax_side["params"][f"TorchLinear_{i}"]["bias"])
            bt = lyr.bias.grad.numpy()
            np.testing.assert_allclose(
                gb, bt, rtol=0, atol=2e-6 * max(np.abs(bt).max(), 1e-8) + 1e-8
            )

    check(grads["coarse"], coarse_t, pt.ARCH["num_layers"])
    check(grads["fine"], fine_t, pt.ARCH["num_layers"])


@pytest.mark.slow
def test_trajectory_quality_parity():
    """Shipped stochastic regime, identical batches + init: the rebuild's
    held-out PSNR matches or beats the reference within tolerance."""
    steps, rays = 150, 128
    batches, eval_set = pt.make_batches(steps, rays)
    ref_models_t, ref_losses, ref_psnr = pt.run_reference(
        batches, eval_set, seed=0, stochastic=True
    )
    our_losses, our_psnr = pt.run_rebuild(
        batches, eval_set, ref_models_t, stochastic=True
    )
    # Both must actually train...
    assert ref_losses[-1] < 0.5 * ref_losses[0]
    assert our_losses[-1] < 0.5 * our_losses[0]
    # ...and land in the same quality regime (tolerance covers the
    # stochastic spread at this tiny size; full-size numbers in BASELINE.md).
    assert our_psnr > ref_psnr - 1.0, (our_psnr, ref_psnr)


@pytest.mark.slow
def test_buff_trajectory_parity():
    """BuFF composed loop (intersect -> render -> integrate -> consolidate)
    vs the torch reference on identical batches + init, at reduced size:

    - stochastic regime: loss trajectories track (log corr) and held-out
      PSNR lands within tolerance of the stock reference;
    - deterministic regime: our tree prunes/subdivides the same cells as
      the CORRECTED-attribution reference (the stock reference integrates
      into mis-ordered voxels via torch's unstable bool sort,
      /root/reference/src/nerf/tree.py:306,334 — its own decisions agree
      with its corrected self far less than ours do)."""
    pt.BUFF_TREE.update(step_size_integration_offset=20, step_size_tree=40,
                        subdivision_outer_count=5, max_voxel_count=300)
    summary = pt.main_buff(num_steps=120, rays_per_step=96)
    assert summary["log_loss_corr"] > 0.98, summary
    assert summary["psnr_delta"] > -1.0, summary
    for snap in summary["tree_agreement"]:
        assert snap["ours_vs_corrected_ref"] > 0.85, snap
        # ours must track the corrected reference better than the stock
        # reference tracks itself — the attribution bug is the reference's.
        assert snap["ours_vs_corrected_ref"] > snap["stock_vs_corrected_ref"], snap
