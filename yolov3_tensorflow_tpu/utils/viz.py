"""Detection drawing helpers (reference utils/plot_utils.py parity)."""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Sequence

import cv2
import numpy as np


def get_color_table(class_num: int, seed: int = 2) -> Dict[int, List[int]]:
    """Seeded random BGR color per class (plot_utils.py:9-14)."""
    rng = random.Random(seed)
    return {i: [rng.randint(0, 255) for _ in range(3)]
            for i in range(class_num)}


def plot_one_box(img: np.ndarray, coord: Sequence[float],
                 label: Optional[str] = None,
                 color: Optional[Sequence[int]] = None,
                 line_thickness: Optional[int] = None) -> None:
    """Draw one xyxy box + filled label tag in place (plot_utils.py:17-34)."""
    tl = line_thickness or max(int(round(0.002 * max(img.shape[0:2]))), 1)
    if color is None:
        color = [random.randint(0, 255) for _ in range(3)]
    c1 = (int(coord[0]), int(coord[1]))
    c2 = (int(coord[2]), int(coord[3]))
    cv2.rectangle(img, c1, c2, color, thickness=tl)
    if label:
        tf = max(tl - 1, 1)
        t_size = cv2.getTextSize(label, 0, fontScale=tl / 3, thickness=tf)[0]
        c3 = (c1[0] + t_size[0], c1[1] - t_size[1] - 3)
        cv2.rectangle(img, c1, c3, color, -1)
        cv2.putText(img, label, (c1[0], c1[1] - 2), 0, tl / 3, [0, 0, 0],
                    thickness=tf, lineType=cv2.LINE_AA)
