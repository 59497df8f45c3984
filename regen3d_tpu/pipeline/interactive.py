"""Interactive segmentation editing (the manual_editor capability).

The reference ships a 1319-line Gradio app (src/utils/manual_editor.py:
383-1316) hooked into phase 1: click-to-add ±SAM points, create/delete/
merge masks, bbox-drawn masks, overlap resolution — returning an edited
``DetectionResult`` list.

Here the capability is an embeddable **session API** around the SAM
encode-once / decode-many split (models/sam.py): every edit re-decodes from
the cached image embedding (the expensive ViT-H pass runs exactly once, as
in the reference's predictor). A UI (gradio when available, else any
front-end) drives these same calls; phase 1 accepts the session's result
via its ``detections=`` argument.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import List, Optional, Tuple

import numpy as np

from regen3d_tpu.pipeline.detection import BoundingBox, DetectionResult

log = logging.getLogger(__name__)


@dataclasses.dataclass
class EditableMask:
    label: str
    mask: np.ndarray                      # (H, W) bool
    points: List[Tuple[float, float, int]] = dataclasses.field(
        default_factory=list)             # (x, y, +1/0) prompt history
    score: float = 1.0


class EditSession:
    """Stateful editing session over one image.

    All ops mirror the reference editor's verbs (manual_editor.py):
    add_point (±), new_from_box, delete, merge, resolve_overlaps, finish.
    """

    def __init__(self, image: np.ndarray, sam=None, sam_params=None,
                 initial: Optional[List[DetectionResult]] = None):
        self.image = image
        self.h, self.w = image.shape[:2]
        self.sam = sam
        self.sam_params = sam_params
        self._embedding = None
        self.masks: List[EditableMask] = [
            EditableMask(d.label, d.mask.copy(), score=d.score)
            for d in (initial or []) if d.mask is not None
        ]

    # --- SAM plumbing ---------------------------------------------------------
    def _embed(self):
        if self._embedding is None:
            import jax
            import jax.numpy as jnp
            size = self.sam.cfg.image_size
            img = np.asarray(jax.image.resize(
                jnp.asarray(self.image, jnp.float32) / 255.0,
                (size, size, 3), "bilinear"))
            from regen3d_tpu.models.sam import SAM
            self._embedding = self.sam.apply(self.sam_params, img[None],
                                             method=SAM.encode)
        return self._embedding

    def _predict(self, points, labels, box=None) -> np.ndarray:
        import jax
        import jax.numpy as jnp
        from regen3d_tpu.models.sam import SAM
        emb = self._embed()
        pts = jnp.asarray(np.asarray(points, np.float32).reshape(1, -1, 2)
                          / [self.w, self.h]) if len(points) else jnp.zeros((1, 1, 2))
        labs = jnp.asarray(np.asarray(labels, np.float32).reshape(1, -1)) \
            if len(points) else -jnp.ones((1, 1))
        bx = jnp.asarray([[[box[0] / self.w, box[1] / self.h],
                           [box[2] / self.w, box[3] / self.h]]]) if box else \
            jnp.asarray([[[0.0, 0.0], [1.0, 1.0]]])
        masks, iou = self.sam.apply(self.sam_params, emb, pts, labs, bx,
                                    method=SAM.decode)
        best = int(np.argmax(np.asarray(iou)[0]))
        m = np.asarray(jax.image.resize(masks[0, best], (self.h, self.w),
                                        "bilinear"))
        return m > 0

    # --- editing verbs ----------------------------------------------------------
    def add_point(self, idx: int, x: float, y: float, positive: bool = True
                  ) -> None:
        """Refine mask #idx with a ± click (re-runs the SAM decoder on the
        full point history, like the reference's predictor loop)."""
        m = self.masks[idx]
        m.points.append((x, y, 1 if positive else 0))
        if self.sam is not None:
            pts = [(px, py) for px, py, _ in m.points]
            labs = [l for _, _, l in m.points]
            m.mask = self._predict(pts, labs)
        else:  # weightless fallback: paint/erase a disc
            yy, xx = np.ogrid[:self.h, :self.w]
            disc = (xx - x) ** 2 + (yy - y) ** 2 <= (0.02 * self.w) ** 2
            m.mask = (m.mask | disc) if positive else (m.mask & ~disc)

    def new_from_box(self, label: str, x0: float, y0: float,
                     x1: float, y1: float) -> int:
        if self.sam is not None:
            mask = self._predict([], [], box=(x0, y0, x1, y1))
        else:
            mask = np.zeros((self.h, self.w), bool)
            mask[int(y0):int(y1), int(x0):int(x1)] = True
        self.masks.append(EditableMask(label, mask))
        return len(self.masks) - 1

    def delete(self, idx: int) -> None:
        self.masks.pop(idx)

    def merge(self, i: int, j: int) -> None:
        a, b = self.masks[i], self.masks[j]
        a.mask = a.mask | b.mask
        self.masks.pop(j)

    def resolve_overlaps(self) -> None:
        """Each pixel belongs to exactly one mask (smaller masks win, the
        reference's conflict policy for nested objects)."""
        order = sorted(range(len(self.masks)),
                       key=lambda i: self.masks[i].mask.sum())
        taken = np.zeros((self.h, self.w), bool)
        for i in order:
            m = self.masks[i]
            m.mask = m.mask & ~taken
            taken |= m.mask

    def finish(self) -> List[DetectionResult]:
        from regen3d_tpu.utils.image import mask_bbox
        out = []
        for m in self.masks:
            if not m.mask.any():
                continue
            x0, y0, x1, y1 = mask_bbox(m.mask)
            out.append(DetectionResult(score=m.score, label=m.label,
                                       box=BoundingBox(x0, y0, x1, y1),
                                       mask=m.mask))
        return out


def launch_gradio_editor(session: EditSession):  # pragma: no cover
    """Back-compat alias: the UI is the dependency-free HTTP editor
    (pipeline/editor_ui.py — same verbs the reference's Gradio app
    exposes); gradio is not shipped in this image."""
    from regen3d_tpu.pipeline.editor_ui import launch_editor
    return launch_editor(session)
