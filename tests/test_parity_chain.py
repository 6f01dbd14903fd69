"""Widened parity vs the PyTorch reference (VERDICT r1 #6).

Round-1 parity was pinned only at 64x64. Interpolation-convention bugs
(nearest vs bilinear grids, adaptive-pool window splits, area-resize
rounding) surface at product-like resolutions, so here:

1. model parity at 640x640 (the reference demo/export shape,
   /root/reference/experiment/adaptive_scaling/demo.py:231) for both neck
   types, on a micro backbone (full tiny at 640 is minutes of XLA CPU
   compile; the convention-sensitive paths — FPN nearest ladders, PPM
   adaptive pooling with non-divisible 160/6 grids, head upsampling — are
   all exercised identically by the micro channel spec);
2. ENGINE-chain parity: the full on-device rough path (area resize ->
   pad /32 -> forward -> sigmoid/threshold -> pad invalidation -> height
   floor) vs a host composition of cv2.INTER_AREA + numpy pad + the torch
   reference model + numpy postprocessing, replicating
   /root/reference/vkit_open_model/inferencing/adaptive_scaling.py:92-188.
"""
import math
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from adascale.models import (
    AdaptiveScaling,
    AdaptiveScalingConfig,
    AdaptiveScalingNeckHeadType,
    AdaptiveScalingSize,
)
from adascale.utils.torch_port import adaptive_scaling_params_from_torch

REFERENCE_PATH = "/root/reference"
MICRO_SPEC = ((8, 1), (16, 1), (32, 1), (64, 1))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_PATH), reason="no reference checkout"
)


def _build_micro_torch(neck_head: str):
    """Reference-module composition with the micro backbone spec, wired and
    attribute-named exactly like the reference AdaptiveScaling
    (model/adaptive_scaling.py:66-141) so the state_dict ports directly."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_PATH)
    from vkit_open_model.model.convnext import ConvNext
    from vkit_open_model.model.fpn import FpnHead, FpnNeck
    from vkit_open_model.model.upernext import UperNextHead, UperNextNeck

    neck_cls, head_cls = (
        (FpnNeck, FpnHead) if neck_head == "fpn" else (UperNextNeck, UperNextHead)
    )

    class MicroAdaptiveScaling(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = ConvNext(
                stem_in_channels=3,
                block_in_channels_and_num_layers=list(MICRO_SPEC),
                stem_use_pconv2x2=False,
            )
            c = self.backbone.in_channels_group[-2]
            self.rough_neck = neck_cls(
                in_channels_group=self.backbone.in_channels_group, out_channels=c
            )
            self.rough_char_mask_head = head_cls(
                in_channels=c, out_channels=1, upsampling_factor=2
            )
            self.rough_char_height_head = torch.nn.Sequential(
                head_cls(
                    in_channels=c,
                    out_channels=1,
                    upsampling_factor=2,
                    init_output_bias=8.0,
                ),
                torch.nn.Softplus(),
            )
            self.precise_neck = neck_cls(
                in_channels_group=self.backbone.in_channels_group, out_channels=c
            )
            self.precise_char_prob_head = head_cls(
                in_channels=c, out_channels=1, upsampling_factor=2
            )
            self.precise_char_up_left_corner_offset_head = head_cls(
                in_channels=c, out_channels=2, upsampling_factor=2
            )
            self.precise_char_corner_angle_head = head_cls(
                in_channels=c, out_channels=4, upsampling_factor=2
            )
            self.precise_char_corner_distance_head = torch.nn.Sequential(
                head_cls(in_channels=c, out_channels=4, upsampling_factor=2),
                torch.nn.Softplus(),
            )

        def forward_rough(self, x):
            f = self.backbone(x)
            n = self.rough_neck(f)
            return self.rough_char_mask_head(n), self.rough_char_height_head(n)

        def forward_precise(self, x):
            f = self.backbone(x)
            n = self.precise_neck(f)
            return (
                self.precise_char_prob_head(n),
                self.precise_char_up_left_corner_offset_head(n),
                self.precise_char_corner_angle_head(n),
                self.precise_char_corner_distance_head(n),
            )

    torch.manual_seed(0)
    return MicroAdaptiveScaling().eval()


def _micro_jax_model():
    return AdaptiveScaling(
        config=AdaptiveScalingConfig(
            size=AdaptiveScalingSize.TINY,
            neck_head_type=AdaptiveScalingNeckHeadType.FPN,  # overridden below
            custom_block_channels_and_num_layers=MICRO_SPEC,
        )
    )


@pytest.mark.parametrize("neck_head", ["fpn", "upernext"])
def test_model_parity_640px(neck_head):
    torch = pytest.importorskip("torch")
    tmodel = _build_micro_torch(neck_head)

    x = np.random.default_rng(7).uniform(0, 255, (1, 3, 640, 640)).astype(np.float32)
    with torch.no_grad():
        t_mask, t_height = tmodel.forward_rough(torch.from_numpy(x))
        t_precise = tmodel.forward_precise(torch.from_numpy(x))

    model = AdaptiveScaling(
        config=AdaptiveScalingConfig(
            size=AdaptiveScalingSize.TINY,
            neck_head_type=(
                AdaptiveScalingNeckHeadType.FPN
                if neck_head == "fpn"
                else AdaptiveScalingNeckHeadType.UPERNEXT
            ),
            custom_block_channels_and_num_layers=MICRO_SPEC,
        )
    )
    params = {
        "params": adaptive_scaling_params_from_torch(tmodel.state_dict(), neck_head)
    }
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    j_mask, j_height = model.apply(params, xj, method=model.forward_rough)
    j_precise = model.apply(params, xj, method=model.forward_precise)

    def check(jarr, tarr, atol):
        np.testing.assert_allclose(
            np.asarray(jarr), np.transpose(tarr.numpy(), (0, 2, 3, 1)), atol=atol
        )

    # BASELINE.json parity bar at product resolution.
    check(j_mask, t_mask, 1e-3)
    check(j_height, t_height, 1e-3)
    for j, t in zip(j_precise, t_precise):
        check(j, t, 1e-3)


def test_engine_rough_chain_parity_vs_host_reference():
    """The engine's fully on-device rough path against a faithful host
    replication of reference rough_infer (cv2 INTER_AREA resize, /32
    zero-pad, torch forward, sigmoid/threshold, pad invalidation, height
    floor — inferencing/adaptive_scaling.py:92-188 + opt.py:21-41)."""
    torch = pytest.importorskip("torch")
    cv2 = pytest.importorskip("cv2")

    from adascale.inference import (
        AdaptiveScalingInference,
        AdaptiveScalingInferenceConfig,
    )
    from adascale.inference.preprocess import compute_rough_shapes

    tmodel = _build_micro_torch("fpn")
    params = adaptive_scaling_params_from_torch(tmodel.state_dict(), "fpn")
    model_cfg = AdaptiveScalingConfig(
        size=AdaptiveScalingSize.TINY,
        neck_head_type=AdaptiveScalingNeckHeadType.FPN,
        custom_block_channels_and_num_layers=MICRO_SPEC,
    )

    # A page larger than short-side-720 on both sides so the resize branch
    # actually runs (reference :96-107), with non-/32 resized dims.
    from adascale.data.synth import SynthPageConfig, generate_page

    page = generate_page(
        SynthPageConfig(page_height=1100, page_width=850),
        np.random.default_rng(3),
    )
    image = page.image  # (1100, 850, 3) uint8

    # ---- host reference composition (float input: isolates convention
    # parity from uint8 quantization, which the on-device path doesn't do).
    (rh, rw), _ = compute_rough_shapes(*image.shape[:2], bucket=32)
    resized = cv2.resize(
        image.astype(np.float32), (rw, rh), interpolation=cv2.INTER_AREA
    )
    ph = math.ceil(rh / 32) * 32
    pw = math.ceil(rw / 32) * 32
    padded = np.zeros((ph, pw, 3), np.float32)
    padded[:rh, :rw] = resized
    x = torch.from_numpy(np.transpose(padded, (2, 0, 1))[None])
    with torch.no_grad():
        t_mask_logits, t_height = tmodel.forward_rough(x)
    t_prob = torch.sigmoid(t_mask_logits)[0, 0].numpy()
    t_mask = (t_prob >= 0.5).astype(np.uint8)
    t_height = t_height[0, 0].numpy().astype(np.float32)
    fdf = 2
    vh, vw = math.ceil(rh / fdf), math.ceil(rw / fdf)
    t_mask[vh:] = 0
    t_mask[:, vw:] = 0
    t_height[vh:] = 0.0
    t_height[:, vw:] = 0.0
    # Pixels numerically at the 3.0 height floor can flip to 0 on one side
    # only — exclude them (band computed BEFORE flooring).
    floor_band = np.abs(t_height - 3.0) < 1e-2
    t_height[t_height < 3.0] = 0.0

    # ---- on-device engine chain (bucket=32 matches the reference's exact
    # pad shape; FPN has no global pooling so parity is positional anyway).
    engine = AdaptiveScalingInference(
        AdaptiveScalingInferenceConfig(
            model=model_cfg, shape_bucket=32, matmul_precision="highest"
        ),
        params=params,
    )
    result = engine.rough_infer(image)
    j_mask = result.rough_char_mask
    j_height = result.rough_char_height_score_map

    assert j_mask.shape == t_mask.shape
    # Thresholded-mask pixels can legitimately flip when |p - 0.5| is below
    # the numeric tolerance; everywhere else they must agree.
    disagree = j_mask != t_mask
    flippable = np.abs(t_prob - 0.5) < 1e-3
    assert np.all(~disagree | flippable), (
        f"{int(np.sum(disagree & ~flippable))} non-threshold mask mismatches"
    )
    # Height map: ignore pixels sitting at the 3.0-floor decision boundary.
    diff = np.abs(j_height - t_height)
    assert float(diff[~floor_band].max()) <= 1e-3


def test_engine_precise_chain_parity_vs_host_reference():
    """Precise-stage chain: on-device pad /32 -> forward_precise ->
    sigmoid/softmax -> pad-zeroing -> reduce_window peak-pick vs the host
    composition of numpy pad + torch + scipy maximum_filter (reference
    inferencing/adaptive_scaling.py:295-396,467-491)."""
    torch = pytest.importorskip("torch")
    scipy_ndimage = pytest.importorskip("scipy.ndimage")

    from adascale.inference import (
        AdaptiveScalingInference,
        AdaptiveScalingInferenceConfig,
    )

    tmodel = _build_micro_torch("fpn")
    params = adaptive_scaling_params_from_torch(tmodel.state_dict(), "fpn")
    model_cfg = AdaptiveScalingConfig(
        size=AdaptiveScalingSize.TINY,
        neck_head_type=AdaptiveScalingNeckHeadType.FPN,
        custom_block_channels_and_num_layers=MICRO_SPEC,
    )

    from adascale.data.synth import SynthPageConfig, generate_page

    page = generate_page(
        SynthPageConfig(page_height=460, page_width=300),
        np.random.default_rng(4),
    )
    stacked = page.image  # stand-in for a stacked-regions image, non-/32 dims

    # Random-init logits hover around 0 -> drop the peak threshold so the
    # peak-pick comparison actually sees peaks.
    thr = 0.45

    # ---- host reference composition.
    h, w = stacked.shape[:2]
    ph = math.ceil(h / 32) * 32
    pw = math.ceil(w / 32) * 32
    padded = np.zeros((ph, pw, 3), np.float32)
    padded[:h, :w] = stacked.astype(np.float32)
    x = torch.from_numpy(np.transpose(padded, (2, 0, 1))[None])
    with torch.no_grad():
        t_prob_l, t_off, t_angle_l, t_dist = tmodel.forward_precise(x)
    t_prob = torch.sigmoid(t_prob_l)[0, 0].numpy().astype(np.float32)
    t_angle = torch.softmax(t_angle_l, dim=1)[0].numpy().transpose(1, 2, 0)
    t_off = t_off[0].numpy().transpose(1, 2, 0)
    t_dist = t_dist[0].numpy().transpose(1, 2, 0)
    fdf = 2
    vh, vw = math.ceil(h / fdf), math.ceil(w / fdf)
    t_prob[vh:] = 0.0
    t_prob[:, vw:] = 0.0
    t_peaks = (
        (scipy_ndimage.maximum_filter(t_prob, size=5) == t_prob) & (t_prob >= thr)
    ).astype(np.uint8)

    # ---- on-device engine chain.
    engine = AdaptiveScalingInference(
        AdaptiveScalingInferenceConfig(
            model=model_cfg,
            shape_bucket=32,
            matmul_precision="highest",
            precise_build_polygons_positive_char_prob_thr=thr,
        ),
        params=params,
    )
    result = engine.precise_infer(stacked)
    j_prob = result.precise_char_prob_score_map
    assert j_prob.shape == t_prob.shape
    np.testing.assert_allclose(j_prob, t_prob, atol=1e-3)
    np.testing.assert_allclose(
        result.precise_np_char_up_left_corner_offset, t_off, atol=1e-3
    )
    np.testing.assert_allclose(
        result.precise_np_char_corner_angle_distribution, t_angle, atol=1e-3
    )
    np.testing.assert_allclose(
        result.precise_np_char_corner_distance, t_dist, atol=1e-3
    )
    # Peak sets must agree except where the decision is numerically
    # ambiguous (prob at the threshold, or a near-tie in the 5x5 window).
    disagree = result.precise_peak_mask != t_peaks
    window_max = scipy_ndimage.maximum_filter(t_prob, size=5)
    ambiguous = (np.abs(t_prob - thr) < 5e-3) | (
        (window_max - t_prob) < 5e-3
    ) & (t_prob > 0)
    assert np.all(~disagree | ambiguous), int(np.sum(disagree & ~ambiguous))
    assert t_peaks.sum() > 0  # the comparison saw actual peaks
