"""Data pipeline tests: parsing, augmentation math, label encoding, loader
determinism (reference utils/data_utils.py + utils/data_aug.py semantics)."""

import os

import cv2
import numpy as np
import pytest

from yolov3_tensorflow_tpu.data import augment
from yolov3_tensorflow_tpu.data.annotations import parse_line
from yolov3_tensorflow_tpu.data.encoder import (anchor_iou, encode_labels,
                                                pad_ground_truth)
from yolov3_tensorflow_tpu.data.loader import (DataLoader, multi_scale_size,
                                               parse_example)

ANCHORS = np.array([[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
                    [59, 119], [116, 90], [156, 198], [373, 326]], np.float32)


# ---------------------------------------------------------------------------
# annotations
# ---------------------------------------------------------------------------

def test_parse_line():
    ann = parse_line("7 /tmp/x.jpg 640 480 0 10 20 110 220 3 5 5 50 50")
    assert ann.index == 7 and ann.width == 640 and ann.height == 480
    np.testing.assert_allclose(ann.boxes,
                               [[10, 20, 110, 220], [5, 5, 50, 50]])
    np.testing.assert_array_equal(ann.labels, [0, 3])


def test_parse_line_rejects_empty():
    with pytest.raises(ValueError):
        parse_line("0 /tmp/x.jpg 640 480")


# ---------------------------------------------------------------------------
# augmentation math
# ---------------------------------------------------------------------------

def test_letterbox_resize_golden():
    img = np.full((200, 400, 3), 255, np.uint8)  # wide image
    out, ratio, dw, dh = augment.letterbox_resize(img, 416, 416)
    assert out.shape == (416, 416, 3)
    assert ratio == pytest.approx(416 / 400)
    assert dw == 0 and dh == (416 - int(200 * 416 / 400)) // 2
    # gray padding above and below
    assert (out[0] == 128).all() and (out[-1] == 128).all()
    assert (out[208] == 255).all()


def test_resize_with_boxes_letterbox_roundtrip():
    img = np.zeros((100, 200, 3), np.uint8)
    boxes = np.array([[20, 10, 60, 50, 0.7]], np.float32)  # + mixup col
    out, new_boxes = augment.resize_with_boxes(img, boxes, 416, 416,
                                               letterbox=True)
    ratio = 416 / 200
    dh = (416 - int(100 * ratio)) // 2
    np.testing.assert_allclose(
        new_boxes[0, :4],
        [20 * ratio, 10 * ratio + dh, 60 * ratio, 50 * ratio + dh], rtol=1e-6)
    assert new_boxes[0, 4] == pytest.approx(0.7)  # extra col untouched


def test_random_flip_boxes():
    rng = np.random.default_rng(0)
    img = np.zeros((100, 200, 3), np.uint8)
    boxes = np.array([[20, 10, 60, 50]], np.float32)
    out, fb = augment.random_flip(img, boxes, rng, px=1.0, py=0.0)
    np.testing.assert_allclose(fb[0], [200 - 60, 10, 200 - 20, 50])


def test_crop_boxes_center_rule():
    boxes = np.array([
        [0, 0, 30, 30, 1.0],     # center (15,15) inside crop
        [90, 90, 120, 120, 1.0], # center outside crop
    ], np.float32)
    out = augment.crop_boxes(boxes, (10, 10, 80, 80))
    assert out.shape[0] == 1
    np.testing.assert_allclose(out[0, :4], [0, 0, 20, 20])


def test_mix_up_weights():
    rng = np.random.default_rng(1)
    i1 = np.full((50, 60, 3), 100, np.uint8)
    i2 = np.full((40, 80, 3), 200, np.uint8)
    b1 = np.array([[1, 2, 3, 4]], np.float32)
    b2 = np.array([[5, 6, 7, 8]], np.float32)
    img, boxes = augment.mix_up(i1, i2, b1, b2, rng)
    assert img.shape == (50, 80, 3)
    assert boxes.shape == (2, 5)
    assert boxes[0, 4] + boxes[1, 4] == pytest.approx(1.0)
    np.testing.assert_allclose(boxes[0, :4], b1[0])


def test_random_expand_offsets_boxes():
    rng = np.random.default_rng(2)
    img = np.full((50, 50, 3), 9, np.uint8)
    boxes = np.array([[10, 10, 20, 20, 1.0]], np.float32)
    out, nb = augment.random_expand(img, boxes, rng, max_ratio=3)
    assert out.shape[0] >= 50 and out.shape[1] >= 50
    w = nb[0, 2] - nb[0, 0]
    assert w == pytest.approx(10)
    # box content preserved at the new offset
    ox, oy = int(nb[0, 0] - 10), int(nb[0, 1] - 10)
    assert (out[oy + 10:oy + 20, ox + 10:ox + 20] == 9).all()


def test_color_distort_preserves_shape_dtype():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    out = augment.random_color_distort(np.asarray(img), rng)
    assert out.shape == img.shape and out.dtype == np.uint8


# ---------------------------------------------------------------------------
# label encoder
# ---------------------------------------------------------------------------

def test_anchor_iou_golden():
    iou = anchor_iou(np.array([[10, 13]], np.float32), ANCHORS)
    assert iou[0, 0] == pytest.approx(1.0, rel=1e-5)
    assert np.argmax(iou[0]) == 0


def test_encode_labels_placement():
    # 100x80 box centered at (200, 150) -> best anchor 6 ([116, 90]) ->
    # scale 0 (stride 32), cell (x=6, y=4), slot 0
    boxes = np.array([[150, 110, 250, 190, 0.8]], np.float32)
    labels = np.array([2])
    y = encode_labels(boxes, labels, (416, 416), 5, ANCHORS)
    assert [g.shape for g in y] == [(13, 13, 3, 11), (26, 26, 3, 11),
                                    (52, 52, 3, 11)]
    cell = y[0][4, 6, 0]
    np.testing.assert_allclose(cell[0:4], [200, 150, 100, 80])
    assert cell[4] == 1.0 and cell[5 + 2] == 1.0
    assert cell[-1] == pytest.approx(0.8)
    # other grids untouched apart from default mixup weight
    assert y[1][..., 4].sum() == 0 and y[2][..., 4].sum() == 0
    assert (y[1][..., -1] == 1).all()


def test_encode_labels_small_box_goes_to_fine_scale():
    # 12x14 box ~ anchor 0 -> scale 2 (stride 8)
    boxes = np.array([[100, 100, 112, 114]], np.float32)
    y = encode_labels(boxes, np.array([0]), (416, 416), 3, ANCHORS)
    assert y[2][..., 4].sum() == 1 and y[0][..., 4].sum() == 0
    assert y[2][13, 13, 0, 4] == 1.0  # center (106,107)//8 = 13


def test_encode_labels_edge_clipping():
    boxes = np.array([[410, 410, 416, 416]], np.float32)  # center on edge
    y = encode_labels(boxes, np.array([0]), (416, 416), 3, ANCHORS)
    assert sum(g[..., 4].sum() for g in y) == 1  # no IndexError


def test_pad_ground_truth():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 100, 100], [0, 0, 5, 5]],
                     np.float32)
    labels = np.array([1, 2, 3])
    pb, pl, mask = pad_ground_truth(boxes, labels, 2)
    assert mask.tolist() == [True, True]
    assert pl[0] == 2  # largest area retained first


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    rng = np.random.default_rng(0)
    lines = []
    for i in range(8):
        img = rng.integers(0, 255, (np.random.randint(80, 200),
                                    np.random.randint(80, 200), 3),
                           dtype=np.uint8)
        p = str(root / f"img{i}.jpg")
        cv2.imwrite(p, np.asarray(img))
        h, w = img.shape[:2]
        lines.append(f"{i} {p} {w} {h} {i % 3} 5 5 {w - 5} {h - 5}")
    ann = str(root / "train.txt")
    with open(ann, "w") as f:
        f.write("\n".join(lines))
    return ann


def test_multi_scale_schedule_deterministic():
    sizes = [multi_scale_size(s, interval=10, seed=0) for s in range(40)]
    assert sizes == [multi_scale_size(s, interval=10, seed=0) for s in range(40)]
    # constant within an interval
    assert len(set(sizes[:10])) == 1
    assert all(s in [(x * 32, x * 32) for x in range(10, 20)] for s in sizes)
    assert multi_scale_size(5, enabled=False) == (416, 416)


def test_loader_shapes_and_determinism(dataset):
    kw = dict(num_classes=3, anchors=ANCHORS, batch_size=4,
              img_size=(160, 160), mode="train", use_mix_up=True,
              multi_scale=False, num_threads=4, seed=7)
    b1 = list(DataLoader(dataset, **kw).epoch(0))
    b2 = list(DataLoader(dataset, **kw).epoch(0))
    assert len(b1) == 2
    assert b1[0].images.shape == (4, 160, 160, 3)
    assert b1[0].y_true[0].shape == (4, 5, 5, 3, 9)
    assert b1[0].y_true[2].shape == (4, 20, 20, 3, 9)
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x.images, y.images)
        np.testing.assert_array_equal(x.image_ids, y.image_ids)
        for a, b in zip(x.y_true, y.y_true):
            np.testing.assert_array_equal(a, b)
    # different epochs differ (shuffling)
    b3 = next(iter(DataLoader(dataset, **kw).epoch(1)))
    assert not np.array_equal(b1[0].image_ids, b3.image_ids)


def test_loader_val_mode_ordered(dataset):
    dl = DataLoader(dataset, num_classes=3, anchors=ANCHORS, batch_size=1,
                    img_size=(96, 96), mode="val", num_threads=2, seed=0)
    ids = [b.image_ids[0] for b in dl.epoch(0)]
    assert ids == sorted(ids)
    batch = next(iter(dl.epoch(0)))
    assert batch.images.min() >= 0 and batch.images.max() <= 1.0


def test_parse_example_val_objectness(dataset):
    with open(dataset) as f:
        line = f.readline().strip()
    rng = np.random.default_rng(0)
    idx, img, y_true = parse_example(line, 3, (128, 128), ANCHORS, "val",
                                     True, rng)
    assert img.shape == (128, 128, 3)
    assert sum(g[..., 4].sum() for g in y_true) == 1


def test_crop_filters_labels_with_boxes():
    """A crop that drops a box must drop its label too. The reference never
    filters `labels` after bbox_crop drops rows (data_utils.py:152-155 +
    data_aug.py:91), silently shifting every later box onto the wrong class;
    random_crop_with_constraints(labels=...) fixes that."""
    from yolov3_tensorflow_tpu.data.augment import (
        crop_boxes, random_crop_with_constraints)

    # box 0 centered far left, box 1 centered in the window
    boxes = np.asarray([[0, 0, 10, 10, 1.0],
                        [60, 60, 90, 90, 1.0]], np.float32)
    labels = np.asarray([7, 2], np.int32)
    out, keep = crop_boxes(boxes, (50, 50, 50, 50), return_mask=True)
    assert keep.tolist() == [False, True]
    assert labels[keep].tolist() == [2]

    # the sampler propagates the same mask (forced single candidate window)
    rng = np.random.default_rng(0)
    nb, nl, crop = random_crop_with_constraints(
        boxes, (100, 100), rng, constraints=[], labels=labels)
    assert len(nb) == len(nl)

    # randomized: box/label counts always stay aligned through the sampler
    rng = np.random.default_rng(3)
    for _ in range(20):
        n = int(rng.integers(1, 12))
        b = np.zeros((n, 5), np.float32)
        b[:, 0] = rng.uniform(0, 180, n)
        b[:, 1] = rng.uniform(0, 180, n)
        b[:, 2] = b[:, 0] + rng.uniform(4, 60, n)
        b[:, 3] = b[:, 1] + rng.uniform(4, 60, n)
        lab = rng.integers(0, 5, n).astype(np.int32)
        nb, nl, _ = random_crop_with_constraints(b, (220, 220), rng,
                                                 labels=lab)
        assert len(nb) == len(nl) > 0


def test_multi_scale_sizes_override():
    from yolov3_tensorflow_tpu.data.loader import multi_scale_size

    sizes = ((128, 128), (160, 160), (192, 192))
    seen = set()
    for step in range(0, 100, 10):
        s = multi_scale_size(step, interval=10, seed=3, base_size=(160, 160),
                             sizes=sizes)
        assert s in sizes
        seen.add(s)
        # deterministic: same step bucket -> same size
        assert s == multi_scale_size(step + 9, interval=10, seed=3,
                                     base_size=(160, 160), sizes=sizes)
    assert len(seen) > 1
