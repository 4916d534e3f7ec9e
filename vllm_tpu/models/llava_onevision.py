"""LLaVA-OneVision (reference behavior parity:
vllm/model_executor/models/llava_onevision.py).

vs LLaVA-NeXT: SigLIP tower with the "full" feature-select strategy (no
CLS to drop), and the anyres packer caps the token budget at
``vision_aspect_ratio`` = "anyres_max_N": after unpadding, if the
spatial grid exceeds sqrt-ratio 1.1 of N base tiles it is BILINEARLY
downscaled (HF modeling_llava_onevision.py pack_image_features:329);
single-tile images append one trailing image_newline row. Video inputs
(pixel_values_videos) are not wired; images cover the arch's serving
surface here."""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from vllm_tpu.models.clip import ClipVisionArgs, SiglipVisionTower
from vllm_tpu.models.llava_next import (LlavaNextForConditionalGeneration,
                                        get_anyres_image_grid_shape,
                                        unpad_image)


def bilinear_resize(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """[C, H, W] -> [C, out_h, out_w], torch F.interpolate(mode=
    "bilinear", align_corners=False) semantics (half-pixel centers,
    edge clamp)."""
    C, H, W = x.shape

    def axis_weights(n_in, n_out):
        centers = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        lo = np.floor(centers).astype(np.int64)
        frac = centers - lo
        lo0 = np.clip(lo, 0, n_in - 1)
        lo1 = np.clip(lo + 1, 0, n_in - 1)
        return lo0, lo1, frac.astype(np.float64)

    y0, y1, fy = axis_weights(H, out_h)
    x0, x1, fx = axis_weights(W, out_w)
    top = x[:, y0][:, :, x0] * (1 - fx) + x[:, y0][:, :, x1] * fx
    bot = x[:, y1][:, :, x0] * (1 - fx) + x[:, y1][:, :, x1] * fx
    out = top * (1 - fy[None, :, None]) + bot * fy[None, :, None]
    return out.astype(x.dtype)


class LlavaOnevisionForConditionalGeneration(
        LlavaNextForConditionalGeneration):

    def __init__(self, model_config) -> None:
        super().__init__(model_config)
        hf = model_config.resolve_hf_config()
        self.vision_aspect_ratio = getattr(hf, "vision_aspect_ratio",
                                           "anyres_max_9")
        if getattr(hf.vision_config, "model_type",
                   "").startswith("siglip"):
            self.vision_args = ClipVisionArgs.from_hf_config(
                hf.vision_config)
            self.vision = SiglipVisionTower(
                self.vision_args,
                feature_layer=int(getattr(hf, "vision_feature_layer",
                                          -1)),
                post_ln=False)
            # siglip has no CLS: "full" keeps every patch token
            self.select_strategy = getattr(
                hf, "vision_feature_select_strategy", "full")

    def encode_image_mm(self, params, mm_inputs: dict) -> np.ndarray:
        pv = np.asarray(mm_inputs["pixel_values"], np.float32)
        if pv.ndim == 5:
            pv = pv[0]
        sizes = np.asarray(mm_inputs.get("image_sizes",
                                         [[pv.shape[-2], pv.shape[-1]]]))
        image_size = tuple(int(x) for x in np.asarray(sizes).reshape(-1)[:2])
        side = self.vision_args.image_size
        n_tok_side = side // self.vision_args.patch_size

        if self._encode_tiles is None:
            self._encode_tiles = jax.jit(
                LlavaNextForConditionalGeneration.encode_image.__get__(
                    self))
        feats = np.asarray(
            self._encode_tiles(params, jnp.asarray(pv)))  # [P, T, H]
        newline = np.asarray(params["image_newline"], np.float32)

        if feats.shape[0] == 1:
            # single tile: one trailing newline row
            # (pack_image_features:352)
            return np.concatenate([feats[0], newline[None]], axis=0)

        base = feats[0]
        nph, npw = get_anyres_image_grid_shape(image_size,
                                               self.grid_pinpoints, side)
        h = w = n_tok_side
        spatial = feats[1:].reshape(nph, npw, h, w, -1)
        spatial = spatial.transpose(4, 0, 2, 1, 3)
        spatial = spatial.reshape(spatial.shape[0], nph * h, npw * w)
        spatial = unpad_image(spatial, image_size)
        max_patches = int(self.vision_aspect_ratio.removeprefix(
            "anyres_max_"))
        _, ch, cw = spatial.shape
        ratio = math.sqrt(ch * cw / (max_patches * h * h))
        if ratio > 1.1:
            spatial = bilinear_resize(spatial, int(ch // ratio),
                                      int(cw // ratio))
        nl = np.broadcast_to(newline[:, None, None],
                             (newline.shape[0], spatial.shape[1], 1))
        spatial = np.concatenate([spatial, nl], axis=2)
        spatial = spatial.reshape(spatial.shape[0], -1).T
        return np.concatenate([base, spatial], axis=0)
