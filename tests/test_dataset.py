import numpy as np

from repas_tpu.io.dataset import PoseSequenceDataset
from repas_tpu.io.image import write_depth_png, write_image
from repas_tpu.io.pose_txt import load_transform_txt


def test_pose_sequence_dataset(tmp_path, rng):
    """C17 contract: rgb/ depth/ mask/ cam_K.txt (+ ob_in_cam round-trip)."""
    root = tmp_path / "seq"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    (root / "mask").mkdir()
    K = np.array([[600.0, 0, 64], [0, 600.0, 48], [0, 0, 1.0]])
    np.savetxt(root / "cam_K.txt", K)
    for i in range(3):
        rgb = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        write_image(root / "rgb" / f"{i:06d}.png", rgb)
        write_depth_png(root / "depth" / f"{i:06d}.png",
                        np.full((96, 128), 0.5 + 0.1 * i, np.float32))
        m = np.zeros((96, 128), dtype=np.uint8)
        m[20:60, 30:90] = 255
        write_image(root / "mask" / f"{i:06d}.png", m)

    ds = PoseSequenceDataset(root)
    assert len(ds) == 3
    f = ds[1]
    assert f.rgb.shape == (96, 128, 3)
    np.testing.assert_allclose(np.median(f.depth_m), 0.6, atol=1e-3)
    assert f.mask.sum() == 40 * 60
    np.testing.assert_allclose(f.K, K)
    assert f.pose is None

    # pose export/ingest round-trip (run_custom.py ob_in_cam contract)
    T = np.eye(4)
    T[:3, 3] = [0.1, -0.2, 0.9]
    ds.write_pose(f.stem, T)
    f2 = ds[1]
    np.testing.assert_allclose(f2.pose, T)
    np.testing.assert_allclose(
        load_transform_txt(root / "ob_in_cam" / f"{f.stem}.txt"), T)

    frames = list(ds)
    assert [fr.index for fr in frames] == [0, 1, 2]
