"""Sliding-window glomerulus detection over whole slides.

Replicates ``module/faster-rcnn/detect_glomus_test.py``: per slide, choose
the pyramid level with objective/downsample <= 5x (``:254-261``), slide a
``STD_SIZE``-micrometre window with ``OVERLAP_RATIO`` (``:286-304``), run
the detector on each window, and append CSV rows in level-0 pixel
coordinates (``:306-326``) plus a per-slide timing log (``:152-158``).

TPU-native difference: windows are **batched** — the reference feeds the TF
session one window at a time; here a fixed-size batch of windows is staged
to the device per forward, with one XLA compilation per window geometry.
The detector is a pluggable backend so tests can substitute a synthetic
one; :class:`JaxDetectorBackend` wraps :class:`..models.faster_rcnn.FasterRCNN`.
"""
from __future__ import annotations

import datetime
import math
import os
import time
from typing import Iterator, List, Optional, Tuple

import numpy as np

from .. import wsi
from ..utils.glomus_handler import GlomusHandler
from ..utils.target_list import read_target_list

NDPI_EXT = [".ndpi", ".tiff", ".tif", ".svs"]
PNG_EXT = [".PNG", ".png"]


class DetectorBackend:
    """Protocol: batched window detection.

    ``detect_batch(images)`` takes (B, H, W, 3) uint8 RGB windows and
    returns numpy ``(boxes, scores, classes, num)`` with boxes normalized
    ``[ymin, xmin, ymax, xmax]`` sorted by descending score per window —
    the frozen-graph output contract (detect_glomus_test.py:349-368).

    Device backends may additionally implement the async pair
    ``detect_batch_submit(images) -> handle`` / ``read_detections(handle)``
    so the scan loop can overlap batch N+1's transfer+dispatch with
    reading batch N (the host->device channel degrades ~40x once a large
    program has executed on the axon tunnel).
    """

    batch_size: int = 8

    def detect_batch(self, images: np.ndarray):
        raise NotImplementedError

    detect_batch_submit = None  # async pair unsupported by default

    def read_detections(self, handle):
        raise NotImplementedError


def _read_detections(out):
    """Device detection dict -> host numpy tuple via ONE readback.

    Each tiny device->host read pays ~30 ms of tunnel latency (profiled
    round 2), so the four output tensors are concatenated on device and
    split on host."""
    import jax.numpy as jnp

    b = out["detection_boxes"]  # (B, M, 4) float32
    n, m = b.shape[:2]
    packed = np.asarray(jnp.concatenate([
        b.reshape(n, -1),
        out["detection_scores"].astype(jnp.float32),
        out["detection_classes"].astype(jnp.float32),
        out["num_detections"].reshape(n, 1).astype(jnp.float32)], axis=1))
    return (packed[:, : m * 4].reshape(n, m, 4),
            packed[:, m * 4: m * 5],
            packed[:, m * 5: m * 6],
            packed[:, -1])


def _data_sharding(mesh):
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(mesh, P("data"))


def _make_backend_mesh(data_parallel: int, batch_size: int):
    """Window batches shard over the mesh's 'data' axis — detection is the
    wall-clock-dominant stage (SURVEY.md §3.2), and the reference leaves it
    single-device."""
    from ..parallel.mesh import make_data_mesh

    return make_data_mesh(data_parallel, batch_size)


def _shard_detect_fn(mesh, fn, n_array_args: int):
    """jit ``fn`` with the image batch sharded over 'data'; all detector
    outputs are batch-leading, so they shard the same way."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    in_shardings = (repl,) * (n_array_args - 1) + (data,)
    return jax.jit(fn, in_shardings=in_shardings,
                   out_shardings={"detection_boxes": data,
                                  "detection_scores": data,
                                  "detection_classes": data,
                                  "num_detections": data})


class JaxDetectorBackend(DetectorBackend):
    """FasterRCNN-based backend; one jitted program per window geometry."""

    def __init__(self, variables, config=None, batch_size: int = 8,
                 score_threshold: float = 0.0,
                 compute_dtype: str = "bfloat16", data_parallel: int = 0):
        from ..models.faster_rcnn import FasterRCNN, FasterRCNNConfig

        self.base_config = config or FasterRCNNConfig()
        self.variables = variables
        self.batch_size = batch_size
        self.score_threshold = score_threshold
        self.compute_dtype = compute_dtype
        self._compiled = {}
        self.mesh = _make_backend_mesh(data_parallel, batch_size)
        if self.mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            self.variables = jax.device_put(
                self.variables, NamedSharding(self.mesh, P()))

    def _get_fn(self, h: int, w: int):
        import dataclasses

        import jax
        import jax.numpy as jnp

        from ..models.faster_rcnn import FasterRCNN, build_anchors

        key = (h, w)
        if key not in self._compiled:
            cfg = dataclasses.replace(self.base_config, image_size=(h, w))
            dtype = jnp.dtype(self.compute_dtype)
            # thread the compute dtype into the model: casting only the
            # input would promote back to f32 at the first f32-param conv
            # (flax dtype=None promotes); box decode/NMS stay f32 inside
            model = FasterRCNN(cfg, dtype=None if dtype == jnp.float32
                               else dtype)
            anchors = build_anchors(cfg)

            def fn(variables, images):
                # no input cast: preprocess subtracts the pixel means in
                # f32 exactly, then the backbone casts to the compute
                # dtype (casting the raw pixels first would round the
                # means in bf16 for no gain)
                return model.apply(variables, images, anchors,
                                   method=FasterRCNN.detect)

            if self.mesh is not None:
                fn = _shard_detect_fn(self.mesh, fn, 2)
            else:
                fn = jax.jit(fn)
            self._compiled[key] = fn
        return self._compiled[key]

    def detect_batch_submit(self, images: np.ndarray):
        import jax

        fn = self._get_fn(images.shape[1], images.shape[2])
        return fn(self.variables,
                  jax.device_put(images, _data_sharding(self.mesh)))

    def read_detections(self, handle):
        return _read_detections(handle)

    def detect_batch(self, images: np.ndarray):
        return _read_detections(self.detect_batch_submit(images))


class ODAPIDetectorBackend(DetectorBackend):
    """Backend running the reference's downloaded OD-API frozen graph
    (``frozen_inference_graph.pb``) natively: constants are extracted and
    assembled into :class:`..models.od_api_frcnn.ODAPIFasterRCNN`
    (inception_v2 trunk, BN folded), then jitted once per window geometry.

    The graph's internal ``keep_aspect_ratio_resizer`` (min 600 / max 1024)
    uses TF1 ``resize_bilinear`` sampling (``scale*i``, no half-pixel
    shift) — reproduced exactly by default (``compat_tf1_resize=True``,
    the CLAUDE.md reference-quirk convention); ``compat_tf1_resize=False``
    substitutes cv2 half-pixel bilinear instead.  ``device_resize`` picks
    where the resize runs: on host (default — the 1024-px window shrinks
    to 600 px before crossing the host->device link, which degrades ~40x
    once a large program has executed on this tunnel) or fused into the
    device program (preferable on hardware with a healthy PCIe/ICI path).
    Normalized output boxes are aspect-preserving, so they map back to
    the window unchanged, exactly as the frozen graph's do
    (detect_glomus_test.py:359-368).
    """

    def __init__(self, pb_path: Optional[str] = None, batch_size: int = 8,
                 compute_dtype: str = "bfloat16", data_parallel: int = 0,
                 consts=None, params=None, num_classes: Optional[int] = None,
                 device_resize: bool = False,
                 compat_tf1_resize: bool = True,
                 **config_overrides):
        from ..convert.pb_import import (
            assemble_od_api_params,
            load_od_api_detector_params,
        )

        if params is not None:
            # already-assembled tree (a fine-tuned od_api_detector.ckpt.pth)
            assert num_classes is not None, "params requires num_classes"
            self.params, self.num_classes = params, num_classes
        elif consts is not None:
            # pre-extracted constant dict (tests/benches synthesize OD-API
            # layouts without writing a .pb file)
            self.params, self.num_classes = assemble_od_api_params(consts)
        else:
            self.params, self.num_classes = load_od_api_detector_params(
                pb_path)
        self.batch_size = batch_size
        self.compute_dtype = compute_dtype
        self.config_overrides = config_overrides
        self.device_resize = device_resize
        self.compat_tf1_resize = compat_tf1_resize
        self._compiled = {}
        self.mesh = _make_backend_mesh(data_parallel, batch_size)

    def _get_fn(self, h: int, w: int):
        key = (h, w)
        if key not in self._compiled:
            import jax

            from ..models.od_api_frcnn import (
                ODAPIConfig,
                ODAPIFasterRCNN,
                keep_aspect_resize_shape,
            )

            base = ODAPIConfig(num_classes=self.num_classes,
                               **self.config_overrides)
            rh, rw = keep_aspect_resize_shape(h, w, base.min_dimension,
                                              base.max_dimension)
            import dataclasses

            cfg = dataclasses.replace(base, image_size=(rh, rw))
            model = ODAPIFasterRCNN(self.params, cfg, self.compute_dtype)

            def fn(images, _model=model, _rh=rh, _rw=rw, _h=h, _w=w):
                if self.device_resize and (_rh, _rw) != (_h, _w):
                    import jax
                    import jax.numpy as jnp

                    from ..ops.resize import (
                        resize_bilinear,
                        resize_bilinear_tf1,
                    )

                    op = (resize_bilinear_tf1 if self.compat_tf1_resize
                          else resize_bilinear)
                    images = jax.vmap(
                        lambda im: op(im.astype(jnp.float32),
                                      _rh, _rw))(images)
                return _model.detect(images)

            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                model.params = jax.device_put(
                    model.params, NamedSharding(self.mesh, P()))
                fn = _shard_detect_fn(self.mesh, fn, 1)
            else:
                fn = jax.jit(fn)
            self._compiled[key] = ((rh, rw), fn)
        return self._compiled[key]

    def detect_batch_submit(self, images: np.ndarray):
        import jax

        (rh, rw), fn = self._get_fn(images.shape[1], images.shape[2])
        if not self.device_resize and (rh, rw) != images.shape[1:3]:
            if self.compat_tf1_resize:
                from ..ops.resize import resize_bilinear_tf1_np

                # resize output is float (the graph resizes after to_float);
                # ship it in the compute dtype so the exactness doesn't
                # cost 4x transfer bytes on the host->device link
                import jax.numpy as jnp

                images = np.stack([resize_bilinear_tf1_np(im, rh, rw)
                                   for im in images]).astype(
                                       jnp.dtype(self.compute_dtype))
            else:
                import cv2

                images = np.stack([
                    cv2.resize(im, (rw, rh), interpolation=cv2.INTER_LINEAR)
                    for im in images])
        return fn(jax.device_put(images, _data_sharding(self.mesh)))

    def read_detections(self, handle):
        return _read_detections(handle)

    def detect_batch(self, images: np.ndarray):
        return _read_detections(self.detect_batch_submit(images))


def threshold_boxes(boxes: np.ndarray, scores: np.ndarray, window_x: int,
                    window_y: int, thresh: float) -> List[List]:
    """Normalized boxes -> thresholded window-pixel boxes
    (detect_glomus_test.py:354-368; scores are sorted descending)."""
    count = int(np.sum(scores >= thresh))
    out = []
    for i in range(count):
        ymin, xmin, ymax, xmax = boxes[i]
        out.append([int(window_x * xmin), int(window_y * ymin),
                    int(window_x * xmax), int(window_y * ymax),
                    float(scores[i])])
    return out


class GlomusDetector(GlomusHandler):
    """Whole-slide sliding-window detection runner."""

    def __init__(self, data_category: str, target_list: str, data_dir: str,
                 output_dir: str, output_file_ext: str,
                 window_size: Optional[int], overlap_ratio: Optional[float],
                 conf_threshold: float, batch_size: int = 8,
                 resume: bool = False):
        self.data_category = data_category
        self.set_type(data_category)
        if window_size is None or window_size == "":
            self.STD_SIZE = 500
            self.OVERLAP_RATIO = 0.5
        else:
            self.STD_SIZE = window_size
            self.OVERLAP_RATIO = overlap_ratio
        self.CONF_THRESH = conf_threshold
        self.batch_size = batch_size
        self.staining_dir = GlomusHandler.get_staining_type(data_category)
        self.target_list = target_list
        self.data_dir = data_dir
        self.output_root_dir = output_dir
        os.makedirs(self.output_root_dir, exist_ok=True)
        self.output_file_path = os.path.join(
            self.output_root_dir, self.TYPE + output_file_ext + ".csv")
        self.log_file = os.path.join(
            self.output_root_dir, self.TYPE + output_file_ext + "_log.csv")
        # per-slide resumability: with resume=True, slides already recorded
        # in the timing log are skipped and outputs are appended (the
        # reference restarts long jobs by hand-editing --start/--end;
        # SURVEY.md §5.3)
        self.resume = resume
        self._completed = set()
        if resume and os.path.isfile(self.log_file):
            with open(self.log_file) as f:
                for line in f.readlines()[1:]:
                    name = line.split(",")[0].strip().strip('"')
                    if name:
                        self._completed.add(name)
        # per-slide metadata
        self.org_slide_width = 0
        self.org_slide_height = 0
        self.org_slide_objective_power = 0.0
        self.slide_downsample = 0.0
        self.mpp_x = 0.0
        self.mpp_y = 0.0

    # ---------------- geometry ----------------
    def calc_window_size(self):
        """µm window -> px sizes + grid counts (detect_glomus_test.py:286-304)."""
        window_x_org = float(self.STD_SIZE) / self.mpp_x
        window_y_org = float(self.STD_SIZE) / self.mpp_y
        x_split_times = int(math.ceil(
            self.org_slide_width / window_x_org / (1.0 - self.OVERLAP_RATIO)))
        y_split_times = int(math.ceil(
            self.org_slide_height / window_y_org / (1.0 - self.OVERLAP_RATIO)))
        window_x = int(math.ceil(window_x_org / self.slide_downsample))
        window_y = int(math.ceil(window_y_org / self.slide_downsample))
        return (window_x_org, window_y_org, x_split_times, y_split_times,
                window_x, window_y)

    # ---------------- main loops ----------------
    def split_all(self, backend: DetectorBackend):
        site_name = self.data_dir.split("/")[-2] if "/" in self.data_dir else ""
        mode = "a" if (self.resume and self._completed) else "w"
        with open(self.output_file_path, mode) as output_file, \
                open(self.log_file, mode) as log_file:
            if mode == "w":
                log_file.write("file,time\n")
            for entry in read_target_list(self.target_list):
                if entry.is_comment:
                    continue
                if entry.file_name in self._completed:
                    print(f"skip {entry.file_name} (already processed)")
                    continue
                meta = entry.metadata
                self.org_slide_width = meta.org_slide_width
                self.org_slide_height = meta.org_slide_height
                self.org_slide_objective_power = meta.org_slide_objective_power
                self.slide_downsample = meta.slide_downsample
                self.mpp_x = meta.mpp_x
                self.mpp_y = meta.mpp_y

                target_dir = os.path.join(self.data_dir, self.staining_dir,
                                          entry.specimen_id)
                if not os.path.isdir(target_dir):
                    continue
                for candidate in sorted(os.listdir(target_dir)):
                    body, ext = os.path.splitext(candidate)
                    if entry.file_name.find(body) >= 0 and ext in NDPI_EXT:
                        image_type = "ndpi"
                    elif entry.file_name.find(body) >= 0 and ext in PNG_EXT:
                        image_type = "png"
                    else:
                        continue
                    start_time = time.time()
                    self.split(backend, image_type, site_name,
                               entry.specimen_id, candidate, output_file)
                    log_file.write('"{}",{}\n'.format(
                        entry.file_name, time.time() - start_time))
                    log_file.flush()
                    break

    def split(self, backend, image_type, site_name, patient_id, file_name,
              output_file):
        path = os.path.join(self.data_dir, self.staining_dir, patient_id,
                            file_name)
        if image_type == "png":
            from PIL import Image

            with Image.open(path) as img:
                self.scan_region_from_image(backend, img, site_name,
                                            patient_id, file_name,
                                            output_file)
        else:
            with wsi.open_slide(path) as slide:
                self.org_slide_width, self.org_slide_height = slide.dimensions
                self.mpp_x = float(slide.properties[wsi.PROPERTY_NAME_MPP_X])
                self.mpp_y = float(slide.properties[wsi.PROPERTY_NAME_MPP_Y])
                self.org_slide_objective_power = int(float(
                    slide.properties[wsi.PROPERTY_NAME_OBJECTIVE_POWER]))
                self.scan_region(backend, slide, site_name, patient_id,
                                 file_name, output_file)

    def _iter_batches(self, windows: Iterator[Tuple[int, int, np.ndarray]]):
        """Group (i, j, image) windows into fixed-size padded batches,
        prefetching window reads on a background thread so tile decode
        overlaps device compute (the reference reads synchronously between
        ``sess.run`` calls)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=2 * self.batch_size)
        SENTINEL = object()

        def producer():
            # a window-read failure must reach the consumer, not silently
            # truncate the scan (the slide would be logged complete with
            # missing detections — same contract as the fused producers)
            try:
                for item in windows:
                    q.put(item)
                q.put(SENTINEL)
            except BaseException as e:  # re-raised in the consumer loop
                q.put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        buf = []
        while True:
            item = q.get()
            if item is SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            buf.append(item)
            if len(buf) == self.batch_size:
                yield buf
                buf = []
        if buf:
            yield buf
        thread.join()

    def _run_windows(self, backend, windows, window_x, window_y, scale,
                     offset_fn, output_file, site_name, specimen_id,
                     file_name):
        def emit(batch, results):
            boxes, scores, classes, num = results
            for (i, j, _), b, s in zip(batch, boxes, scores):
                bs = threshold_boxes(b, s, window_x, window_y,
                                     self.CONF_THRESH)
                x_start, y_start = offset_fn(i, j)
                self.write_detected_result(bs, i, j, x_start, y_start,
                                           output_file, site_name,
                                           specimen_id, file_name,
                                           scale)

        submit = getattr(backend, "detect_batch_submit", None)
        pending = None  # one-deep pipeline (see DetectorBackend docstring)
        for batch in self._iter_batches(windows):
            images = np.stack([im for _, _, im in batch])
            if len(batch) < self.batch_size:
                pad = np.repeat(images[-1:], self.batch_size - len(batch), 0)
                images = np.concatenate([images, pad])
            if submit is None:
                emit(batch, backend.detect_batch(images))
                continue
            handle = submit(images)
            if pending is not None:
                emit(pending[0], backend.read_detections(pending[1]))
            pending = (batch, handle)
        if pending is not None:
            emit(pending[0], backend.read_detections(pending[1]))

    def scan_region(self, backend, slide, site_name, specimen_id, file_name,
                    output_file):
        # level with objective/downsample <= 5x (detect_glomus_test.py:254-261)
        self.slide_downsample = 8.0
        target_level = min(3, slide.level_count - 1)
        for level, downsample in enumerate(slide.level_downsamples):
            if self.org_slide_objective_power / downsample <= 5.0:
                target_level = level
                self.slide_downsample = slide.level_downsamples[level]
                break
        (window_x_org, window_y_org, x_split, y_split, window_x,
         window_y) = self.calc_window_size()
        slide_window_x = int(window_x_org * (1.0 - self.OVERLAP_RATIO))
        slide_window_y = int(window_y_org * (1.0 - self.OVERLAP_RATIO))

        def windows():
            for j in range(y_split):
                for i in range(x_split):
                    x_start = slide_window_x * i
                    y_start = slide_window_y * j
                    region = slide.read_region_array(
                        (x_start, y_start), target_level,
                        (window_x, window_y))
                    yield i, j, region

        def offset(i, j):
            return slide_window_x * i, slide_window_y * j

        self._run_windows(backend, windows(), window_x, window_y,
                          self.slide_downsample, offset, output_file,
                          site_name, specimen_id, file_name)

    def scan_region_from_image(self, backend, img, site_name, specimen_id,
                               file_name, output_file):
        (window_x_org, window_y_org, x_split, y_split, window_x,
         window_y) = self.calc_window_size()
        slide_window_x = int(window_x * (1.0 - self.OVERLAP_RATIO))
        slide_window_y = int(window_y * (1.0 - self.OVERLAP_RATIO))

        def windows():
            for j in range(y_split):
                for i in range(x_split):
                    x_start = slide_window_x * i
                    y_start = slide_window_y * j
                    region = img.crop((x_start, y_start, x_start + window_x,
                                       y_start + window_y))
                    arr = np.asarray(region.convert("RGB"))
                    yield i, j, arr

        def offset(i, j):
            # PNG path: offsets are scaled to level 0 when written
            return (slide_window_x * i * self.slide_downsample,
                    slide_window_y * j * self.slide_downsample)

        self._run_windows(backend, windows(), window_x, window_y,
                          self.slide_downsample, offset, output_file,
                          site_name, specimen_id, file_name)

    def write_detected_result(self, bs, i, j, x_start, y_start, output_file,
                              site_name, specimen_id, file_name, scale):
        if len(bs) == 0:
            print("X:{}, Y:{}".format(i, j))
            return
        for box in bs:
            if box[4] > 0:
                now = datetime.datetime.today().strftime("%Y-%m-%dT%H:%M:%S")
                output_file.write(
                    '"' + site_name + '","' + specimen_id + '","'
                    + file_name + '",new,' + now + ","
                    + str(x_start + box[0] * scale) + ","
                    + str(y_start + box[1] * scale) + ","
                    + str(x_start + box[2] * scale) + ","
                    + str(y_start + box[3] * scale) + ","
                    + str(box[4]) + "\n")
                output_file.flush()
