"""SamPredictor: set_image / predict API over the dual-decoder SAM.

Capability parity with reference segment_anything/predictor.py (point,
box and mask prompts) — upgraded to the bimanual model: predict() takes
`hand` ("left"/"right") and the left decoder also returns the taxonomy.
The image embedding is computed once per set_image (jitted, cached);
prompts run through the same jitted decode used by evaluate()."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class SamPredictor:
    def __init__(self, sam_module, params, image_size: int = 1024):
        import jax
        import jax.numpy as jnp

        self.model = sam_module
        self.params = params
        self.image_size = image_size
        self._embedding = None
        self._input_hw = None
        self._orig_hw = None

        self._encode = jax.jit(
            lambda p, img: self.model.apply(p, img, method="encode_image"))

        def _decode(p, emb, points, labels, boxes, masks, multimask):
            def fn(m):
                sparse, dense = m.prompt_encoder(
                    points=(points, labels) if points is not None else None,
                    boxes=boxes, masks=masks)
                image_pe = m.prompt_encoder.get_dense_pe()[None]
                # multimask_output selects the decoder's token set:
                # False = the dedicated single-mask token 0 (reference
                # predictor.py passes the flag through to the decoder).
                out_l = m.mask_decoder_left(
                    emb, image_pe, sparse, dense,
                    multimask_output=multimask)
                out_r = m.mask_decoder_right(
                    emb, image_pe, sparse, dense,
                    multimask_output=multimask)
                return out_l, out_r

            return self.model.apply(p, method=fn)

        self._decode = jax.jit(_decode, static_argnums=6)

        def _decode_batch(p, emb, points, labels, multimask):
            # N prompts against ONE cached embedding: broadcast the
            # embedding to the prompt batch inside jit (the reference
            # decoder repeat_interleaves per prompt token the same way,
            # mask_decoder.py predict_masks) so the whole point grid is
            # one compiled decode instead of a host loop.
            emb_t = jnp.broadcast_to(
                emb, (points.shape[0],) + emb.shape[1:])
            return _decode(p, emb_t, points, labels, None, None, multimask)

        self._decode_batch = jax.jit(_decode_batch, static_argnums=4)

    def set_image(self, image: np.ndarray) -> None:
        """image: (H, W, 3) uint8 RGB."""
        import jax.numpy as jnp

        from ..data.transforms import sam_preprocess

        canvas, resize_hw = sam_preprocess(image, self.image_size)
        self._input_hw = resize_hw
        self._orig_hw = image.shape[:2]
        self._embedding = self._encode(self.params, jnp.asarray(canvas)[None])

    def _transform_coords(self, coords: np.ndarray) -> np.ndarray:
        """Original-pixel coords -> resized-canvas coords (reference
        transforms.py apply_coords)."""
        oh, ow = self._orig_hw
        rh, rw = self._input_hw
        out = np.asarray(coords, np.float32).copy()
        out[..., 0] *= rw / ow
        out[..., 1] *= rh / oh
        return out

    def predict(self, point_coords: Optional[np.ndarray] = None,
                point_labels: Optional[np.ndarray] = None,
                box: Optional[np.ndarray] = None,
                multimask_output: bool = True,
                return_logits: bool = False,
                hand: str = "left"
                ) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
        """Returns (masks (n, H, W) at original resolution — binary, or
        raw logits with return_logits (reference predictor.py's
        return_logits flag, required by the AMG's stability score),
        iou_predictions (n,), taxonomy (4,) or None)."""
        import jax.numpy as jnp

        assert self._embedding is not None, "call set_image first"
        points = labels = boxes = None
        if point_coords is not None:
            points = jnp.asarray(
                self._transform_coords(point_coords)[None])  # (1, N, 2)
            labels = jnp.asarray(
                np.asarray(point_labels, np.int32)[None])
        if box is not None:
            boxes = jnp.asarray(
                self._transform_coords(np.asarray(box).reshape(2, 2))
                .reshape(1, 4))
        out_l, out_r = self._decode(self.params, self._embedding, points,
                                    labels, boxes, None,
                                    bool(multimask_output))
        masks, iou, tax = self._finish(out_l, out_r, hand, return_logits)
        return masks[0], iou[0], None if tax is None else tax[0]

    def _finish(self, out_l, out_r, hand: str, return_logits: bool):
        """Shared decode tail: hand select, canvas upsample, crop+resize
        to the original frame, optional binarize. Keeps predict and
        predict_batch numerically identical by construction. Returns
        batched (masks (N, n_out, H, W), iou (N, n_out),
        taxonomy (N, 4) | None)."""
        import jax.numpy as jnp

        from ..nn.sam import postprocess_masks_padded, resize_to_original

        if hand == "left":
            masks, iou, taxonomy = out_l
        else:
            (masks, iou), taxonomy = out_r, None
        canvas = np.asarray(postprocess_masks_padded(
            jnp.asarray(masks, jnp.float32), self.image_size))
        n, n_out = canvas.shape[:2]
        flat = resize_to_original(
            canvas.reshape(n * n_out, *canvas.shape[2:]),
            self._input_hw, self._orig_hw)
        orig = flat.reshape(n, n_out, *flat.shape[1:])
        out_masks = orig if return_logits else (orig > 0)
        return (out_masks, np.asarray(iou),
                None if taxonomy is None else np.asarray(taxonomy))

    def predict_batch(self, point_coords: np.ndarray,
                      point_labels: Optional[np.ndarray] = None,
                      multimask_output: bool = True,
                      return_logits: bool = False,
                      hand: str = "left"
                      ) -> Tuple[np.ndarray, np.ndarray,
                                 Optional[np.ndarray]]:
        """N point prompts in ONE jitted decode against the cached
        embedding (the reference AMG's points_per_batch batching,
        automatic_mask_generator.py:24-372 -> predictor.predict_torch).

        point_coords: (N, P, 2) original-pixel coords; point_labels
        (N, P) int (default all-foreground). Returns (masks
        (N, n_out, H, W), iou (N, n_out), taxonomy (N, 4) or None)."""
        import jax.numpy as jnp

        assert self._embedding is not None, "call set_image first"
        pts = np.asarray(point_coords, np.float32)
        if pts.ndim == 2:
            pts = pts[:, None, :]
        n, p, _ = pts.shape
        if point_labels is None:
            point_labels = np.ones((n, p), np.int32)
        points = jnp.asarray(self._transform_coords(pts))
        labels = jnp.asarray(np.asarray(point_labels, np.int32))
        out_l, out_r = self._decode_batch(
            self.params, self._embedding, points, labels,
            bool(multimask_output))
        return self._finish(out_l, out_r, hand, return_logits)
