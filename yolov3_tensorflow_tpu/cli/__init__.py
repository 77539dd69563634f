"""Command-line entry points.

Parity with the reference's script surface (SURVEY.md §1 L6):

  python -m yolov3_tensorflow_tpu.cli.train           (train.py)
  python -m yolov3_tensorflow_tpu.cli.evaluate        (eval.py)
  python -m yolov3_tensorflow_tpu.cli.detect_image    (test_single_image.py)
  python -m yolov3_tensorflow_tpu.cli.detect_video    (video_test.py)
  python -m yolov3_tensorflow_tpu.cli.convert_weights (convert_weight.py)
  python -m yolov3_tensorflow_tpu.cli.kmeans_anchors  (get_kmeans.py)
  python -m yolov3_tensorflow_tpu.cli.parse_voc       (misc/parse_voc_xml.py)
  python -m yolov3_tensorflow_tpu.cli.strip_checkpoint
                                  (misc/remove_optimizers_params_in_ckpt.py)
"""
