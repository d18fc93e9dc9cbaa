"""Unit tests of module process() logic via a lightweight harness (no bus)."""

import numpy as np
import pytest

from cuauv_vision_pipeline_tpu.core import shm


class Harness:
    """Stand-in for the ModuleBase runtime around a module's process()."""

    def __init__(self, module_cls, tuners, shape=(72, 96)):
        self.posts = {}
        self._values = {t.name: t.value for t in tuners}
        self._shape = shape
        # construct without running ModuleBase.__init__
        self.module = object.__new__(module_cls)
        self.module.post = self.post
        self.module._performance_enabled = False
        self.module._post_queue = {}
        self.module._post_color_spaces = {}
        harness = self

        class Tuners:
            def __getitem__(self, k):
                return harness._values[k]

        # ModuleBase.tuners returns self._module_manager; substitute a fake
        self.module._module_manager = Tuners()
        self.module.normalize = lambda c: (
            (c[0] - shape[0] / 2) / shape[1],
            (c[1] - shape[1] / 2) / shape[1],
        )
        self.module.normalize_axis = lambda c, a: (c - shape[1 - a] / 2) / shape[1]
        self.module.get_latency = lambda: 0

    def post(self, name, image, color_space="BGR"):
        self.posts[name] = (np.array(image), color_space)

    def set(self, **values):
        self._values.update(values)


def _teal_image(shape=(72, 96)):
    rng = np.random.default_rng(0)
    img = rng.integers(40, 90, (*shape, 3), dtype=np.uint8)
    img[..., 1] = np.clip(img[..., 1].astype(int) + 60, 0, 255)
    return img


def test_preprocessor_stages():
    from cuauv_vision_pipeline_tpu.modules import preprocessor as P

    h = Harness(P.Preprocessor, P.module_tuners)
    img = _teal_image()

    # identity pass-through
    h.module.process("forward", img)
    out, _ = h.posts["preprocessed"]
    np.testing.assert_array_equal(out, img)

    # brightness shift
    h.set(brightness=50)
    h.module.process("forward", img)
    out, _ = h.posts["preprocessed"]
    assert out.astype(int).mean() > img.astype(int).mean() + 30

    # grayscale makes channels equal
    h.set(brightness=0, grayscale=True)
    h.module.process("forward", img)
    out, _ = h.posts["preprocessed"]
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()

    # resize
    h.set(grayscale=False, resize_factor=0.5)
    h.module.process("forward", img)
    out, _ = h.posts["preprocessed"]
    assert out.shape[:2] == (36, 48)

    # blur reduces high-frequency energy
    h.set(resize_factor=1.0, blur_kernel=7)
    h.module.process("forward", img)
    out, _ = h.posts["preprocessed"]
    assert np.diff(out[..., 0].astype(int), axis=1).std() < np.diff(
        img[..., 0].astype(int), axis=1
    ).std()


def test_poster_scales_depth_and_updates_status():
    from cuauv_vision_pipeline_tpu.modules import poster as P

    shm.poster_status.set(frames_posted=0, latency_ema_sec=0.0)
    shm.zed_metrics.start_time_sec.set(0.0)

    h = Harness(P.Poster, [])
    h.module._latency_ema = 0.0
    h.module._frames = 0

    fwd = _teal_image((36, 48))
    depth = np.full((36, 48, 1), 5.25, np.float32)  # midpoint of 0.5..10
    normal = np.full((36, 48, 3), 0.5, np.float32)
    h.module.handle(fwd, fwd, depth, normal)

    depth_u8, cs = h.posts["depth"]
    assert cs == "GRAY"
    assert abs(int(depth_u8[0, 0]) - 127) <= 2  # mid-range -> mid-gray
    normal_u8, _ = h.posts["normal"]
    assert abs(int(normal_u8[0, 0, 0]) - 127) <= 2
    assert shm.poster_status.frames_posted.get() == 1


def test_record_writes_mp4s(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from cuauv_vision_pipeline_tpu.modules import record as R

    shm.active_mission.set(active=True, log_path=str(tmp_path))
    h = Harness(R.Record, [])
    h.module._writers = {}
    h.module._dir = None

    fwd = _teal_image((48, 64))
    depth = np.full((48, 64, 1), 2.0, np.float32)
    normal = np.full((48, 64, 3), 0.5, np.float32)
    for _ in range(5):
        h.module.handle(fwd, fwd, depth, normal)
    shm.active_mission.active.set(False)
    h.module.handle(fwd, fwd, depth, normal)  # triggers close

    videos = list(tmp_path.glob("record-*/*.mp4"))
    assert len(videos) == 4
    cap = cv2.VideoCapture(str(sorted(videos)[0]))
    assert cap.isOpened()
    ok, frame = cap.read()
    assert ok and frame.shape == (48, 64, 3)


def test_auto_calibrate_drives_exposure_toward_target():
    from cuauv_vision_pipeline_tpu.modules import auto_calibrate as A

    shm.camera_calibration.exposure.set(50.0)
    h = Harness(A.AutoCalibrate, A.module_tuners)
    h.module._exposure_smooth = None

    dark = np.full((48, 64, 3), 20, np.uint8)
    for _ in range(5):
        h.module.process("forward", dark)
    assert shm.camera_calibration.exposure.get() > 50.0  # brightens

    shm.camera_calibration.exposure.set(50.0)
    h.module._exposure_smooth = None
    bright = np.full((48, 64, 3), 240, np.uint8)
    for _ in range(5):
        h.module.process("forward", bright)
    assert shm.camera_calibration.exposure.get() < 50.0  # darkens


def test_normal_relay_averages_normals():
    from cuauv_vision_pipeline_tpu.modules import normal_relay as N

    shm.relay.set(point_x=0.0, point_y=0.0)
    h = Harness(N.NormalRelay, [], shape=(120, 160))

    # normals all pointing +z: u8 encoding of (0, 0, 1) -> (127, 127, 255)
    normal_u8 = np.zeros((120, 160, 3), np.uint8)
    normal_u8[..., 0] = 127
    normal_u8[..., 1] = 127
    normal_u8[..., 2] = 255
    h.module.handle(normal_u8)

    assert abs(shm.relay.normal_z_at_point.get() - 1.0) < 0.05
    assert abs(shm.relay.normal_x_at_point.get()) < 0.05
