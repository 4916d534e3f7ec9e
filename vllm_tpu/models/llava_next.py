"""LLaVA-NeXT (v1.6) — anyres vision-language model (reference behavior
parity: vllm/model_executor/models/llava_next.py).

vs LLaVA: the processor tiles a high-resolution image into a base patch
plus a grid of sub-tiles (per ``image_grid_pinpoints``); each tile runs
the CLIP tower + projector, then the spatial tiles reassemble into a 2-D
feature map, padding from the aspect-preserving resize is removed
(``unpad_image``), an ``image_newline`` column marks row ends, and the
base feature is prepended. All reassembly is host-side numpy (dynamic
shapes per image); only the tower/projector runs jitted."""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from vllm_tpu.models.llava import LlavaForConditionalGeneration


def select_best_resolution(orig_hw: tuple[int, int],
                           possible: list[list[int]]) -> tuple[int, int]:
    """HF llava_next.image_processing select_best_resolution: maximize
    effective resolution, tie-break on minimal wasted area.
    orig_hw/possible are (height, width)."""
    oh, ow = orig_hw
    best = None
    max_eff, min_waste = -1, math.inf
    for h, w in possible:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = w * h - eff
        if eff > max_eff or (eff == max_eff and waste < min_waste):
            max_eff, min_waste = eff, waste
            best = (h, w)
    return best


def get_anyres_image_grid_shape(image_size: tuple[int, int],
                                grid_pinpoints: list[list[int]],
                                patch_size: int) -> tuple[int, int]:
    h, w = select_best_resolution(image_size, grid_pinpoints)
    return h // patch_size, w // patch_size


def image_size_to_num_patches(image_size: tuple[int, int],
                              grid_pinpoints: list[list[int]],
                              patch_size: int) -> int:
    h, w = select_best_resolution(image_size, grid_pinpoints)
    return (h // patch_size) * (w // patch_size) + 1  # + base patch


def unpad_image(tensor: np.ndarray,
                original_size: tuple[int, int]) -> np.ndarray:
    """HF llava_next unpad_image: remove aspect-ratio padding from
    tensor [C, H, W] given the original (h, w)."""
    oh, ow = original_size
    ch, cw = tensor.shape[1], tensor.shape[2]
    original_ar = ow / oh
    current_ar = cw / ch
    if original_ar > current_ar:
        scale = cw / ow
        new_h = int(round(oh * scale, 7))
        pad = (ch - new_h) // 2
        return tensor[:, pad:ch - pad, :]
    scale = ch / oh
    new_w = int(round(ow * scale, 7))
    pad = (cw - new_w) // 2
    return tensor[:, :, pad:cw - pad]


class LlavaNextForConditionalGeneration(LlavaForConditionalGeneration):

    def __init__(self, model_config) -> None:
        super().__init__(model_config)
        hf = model_config.resolve_hf_config()
        self.grid_pinpoints = list(getattr(hf, "image_grid_pinpoints",
                                           []) or [])
        self._encode_tiles = None  # lazy jit per tile-count

    def encode_image_mm(self, params, mm_inputs: dict) -> np.ndarray:
        """Full anyres pipeline for ONE image:
        mm_inputs["pixel_values"]: [num_patches, C, H, W] (or with a
        leading batch dim of 1), mm_inputs["image_sizes"]: (h, w)."""
        pv = np.asarray(mm_inputs["pixel_values"], np.float32)
        if pv.ndim == 5:
            pv = pv[0]
        sizes = np.asarray(mm_inputs.get("image_sizes",
                                         [[pv.shape[-2], pv.shape[-1]]]))
        image_size = tuple(int(x) for x in np.asarray(sizes).reshape(-1)[:2])
        side = self.vision_args.image_size
        n_tok_side = side // self.vision_args.patch_size

        if self._encode_tiles is None:
            self._encode_tiles = jax.jit(super().encode_image)
        feats = np.asarray(
            self._encode_tiles(params, jnp.asarray(pv)))  # [P, T, H]

        base = feats[0]  # [T, H]
        if feats.shape[0] == 1:
            return base
        nph, npw = get_anyres_image_grid_shape(image_size,
                                               self.grid_pinpoints, side)
        h = w = n_tok_side
        spatial = feats[1:].reshape(nph, npw, h, w, -1)
        spatial = spatial.transpose(4, 0, 2, 1, 3)  # [H, nph, h, npw, w]
        spatial = spatial.reshape(spatial.shape[0], nph * h, npw * w)
        spatial = unpad_image(spatial, image_size)
        newline = np.asarray(params["image_newline"], np.float32)
        nl = np.broadcast_to(newline[:, None, None],
                             (newline.shape[0], spatial.shape[1], 1))
        spatial = np.concatenate([spatial, nl], axis=2)
        spatial = spatial.reshape(spatial.shape[0], -1).T  # [S, H]
        return np.concatenate([base, spatial], axis=0)

    def load_weights(self, weights_iter) -> dict:
        newline = {}

        def tap(it):
            for name, w in it:
                if name.removeprefix("model.") == "image_newline":
                    newline["v"] = np.asarray(w)
                else:
                    yield name, w

        params = super().load_weights(tap(weights_iter))
        from vllm_tpu.models.llama import _np_dtype

        npd = _np_dtype(self.model_config.dtype)
        params["image_newline"] = newline.get(
            "v", np.zeros(self.args.hidden_size)).astype(npd)
        return params

    def init_dummy_params(self, seed: int = 0) -> dict:
        params = super().init_dummy_params(seed)
        params["image_newline"] = np.zeros(self.args.hidden_size,
                                           np.float32)
        return params
