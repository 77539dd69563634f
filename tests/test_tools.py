"""Anchor k-means and VOC XML conversion tools
(reference get_kmeans.py + misc/parse_voc_xml.py semantics)."""

import os

import numpy as np
import pytest

from yolov3_tensorflow_tpu.cli.parse_voc import gen_split, parse_xml
from yolov3_tensorflow_tpu.utils.coco import VOC_CLASS_NAMES
from yolov3_tensorflow_tpu.utils.kmeans import (anchors_to_string,
                                                kmeans_anchors,
                                                parse_annotation_sizes,
                                                wh_iou)


def test_wh_iou_golden():
    iou = wh_iou(np.array([[10.0, 20.0]]), np.array([[10, 20], [5, 10],
                                                     [20, 40]]))
    np.testing.assert_allclose(iou[0], [1.0, 0.25, 0.25], rtol=1e-6)


def test_kmeans_recovers_clusters():
    rng = np.random.default_rng(0)
    centers = np.array([[20, 30], [100, 80], [300, 250]], np.float64)
    boxes = np.concatenate([
        c * rng.uniform(0.9, 1.1, (200, 2)) for c in centers])
    anchors, avg_iou = kmeans_anchors(boxes, k=3, seed=1)
    # sorted by area, near the true centers
    assert avg_iou > 0.85
    for got, want in zip(anchors, centers):
        assert np.all(np.abs(got - want) / want < 0.15)


def test_kmeans_rejects_degenerate():
    with pytest.raises(ValueError):
        kmeans_anchors(np.array([[0.0, 5.0], [3.0, 4.0]]), k=1)


def test_parse_annotation_sizes_letterbox(tmp_path):
    f = tmp_path / "train.txt"
    f.write_text("0 /x.jpg 800 400 1 0 0 80 40\n")
    # letterbox ratio to 416: min(416/800, 416/400) = 0.52
    sizes = parse_annotation_sizes(str(f), (416, 416))
    np.testing.assert_allclose(sizes, [[80 * 0.52, 40 * 0.52]], rtol=1e-6)
    # original scale
    sizes = parse_annotation_sizes(str(f), None)
    np.testing.assert_allclose(sizes, [[80, 40]])


def test_anchors_to_string():
    s = anchors_to_string(np.array([[10.7, 13.2], [16.0, 30.9]]))
    assert s == "10,13, 16,30"


_XML = """<annotation>
  <size><width>640</width><height>480</height><depth>3</depth></size>
  <object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>200</xmax><ymax>300</ymax></bndbox>
  </object>
  <object><name>cat</name><difficult>1</difficult>
    <bndbox><xmin>1</xmin><ymin>2</ymin><xmax>3</xmax><ymax>4</ymax></bndbox>
  </object>
  <object><name>unknownthing</name>
    <bndbox><xmin>5</xmin><ymin>6</ymin><xmax>7</xmax><ymax>8</ymax></bndbox>
  </object>
</annotation>"""


def test_parse_xml_skips_difficult_and_unknown(tmp_path):
    p = tmp_path / "a.xml"
    p.write_text(_XML)
    fields = parse_xml(str(p), VOC_CLASS_NAMES)
    # width height label xmin ymin xmax ymax (dog = index 11)
    assert fields == ["640", "480", "11", "10", "20", "200", "300"]


def test_gen_split_writes_flat_lines(tmp_path):
    base = tmp_path / "VOC2007"
    (base / "Annotations").mkdir(parents=True)
    (base / "ImageSets" / "Main").mkdir(parents=True)
    (base / "JPEGImages").mkdir()
    (base / "Annotations" / "000001.xml").write_text(_XML)
    (base / "ImageSets" / "Main" / "trainval.txt").write_text("000001\n")

    out = tmp_path / "train.txt"
    n = gen_split(str(tmp_path), ["2007:trainval"], str(out), VOC_CLASS_NAMES)
    assert n == 1
    line = out.read_text().strip().split(" ")
    assert line[0] == "0"
    assert line[1].endswith("000001.jpg")
    assert line[2:] == ["640", "480", "11", "10", "20", "200", "300"]
