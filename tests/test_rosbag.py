"""Rosbag V2.0 writer round-trip (SLAM bridge output format)."""

import struct

import numpy as np

from pointcept_keypointdetection_tpu.slam.rosbag import (
    BagWriter,
    pack_kitti_scan,
    read_bag,
    serialize_imu,
    serialize_pointcloud2,
)


def test_bag_roundtrip(tmp_path, rng):
    path = str(tmp_path / "test.bag")
    scans = [rng.normal(size=(50, 4)).astype(np.float32) for _ in range(3)]
    imu_vals = [(tuple(rng.normal(size=3)), tuple(rng.normal(size=3))) for _ in range(5)]

    with BagWriter(path, chunk_threshold=2048) as bag:  # force multiple chunks
        t = 1700000000.0
        for i, scan in enumerate(scans):
            raw = serialize_pointcloud2(i, t + i * 0.1, "camera_init", pack_kitti_scan(scan), scan.shape[0])
            bag.write("/kitti/velodyne", "sensor_msgs/PointCloud2", raw, t + i * 0.1)
        for i, (acc, gyr) in enumerate(imu_vals):
            raw = serialize_imu(i, t + i * 0.01, "camera_init", acc, gyr)
            bag.write("/kitti/oxts/imu", "sensor_msgs/Imu", raw, t + i * 0.01)

    msgs = list(read_bag(path))
    pc = [(raw, ts) for topic, mtype, raw, ts in msgs if topic == "/kitti/velodyne"]
    imu = [(raw, ts) for topic, mtype, raw, ts in msgs if topic == "/kitti/oxts/imu"]
    assert len(pc) == 3 and len(imu) == 5

    # deserialize the first PointCloud2: header, dims, fields, payload
    raw, (sec, nsec) = pc[0]
    off = 0
    (seq,) = struct.unpack_from("<I", raw, off); off += 4
    hsec, hnsec = struct.unpack_from("<II", raw, off); off += 8
    (flen,) = struct.unpack_from("<I", raw, off); off += 4
    frame = raw[off : off + flen].decode(); off += flen
    height, width = struct.unpack_from("<II", raw, off); off += 8
    (nfields,) = struct.unpack_from("<I", raw, off); off += 4
    names = []
    for _ in range(nfields):
        (nl,) = struct.unpack_from("<I", raw, off); off += 4
        names.append(raw[off : off + nl].decode()); off += nl
        off += 9  # offset u32, datatype u8, count u32
    off += 1  # is_bigendian
    point_step, row_step = struct.unpack_from("<II", raw, off); off += 8
    (dlen,) = struct.unpack_from("<I", raw, off); off += 4
    payload = raw[off : off + dlen]
    assert frame == "camera_init" and height == 1 and width == 50
    assert names == ["x", "y", "z", "intensity", "ring", "time"]
    assert point_step == 22 and dlen == 22 * 50
    rec = np.frombuffer(payload, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                                        ("intensity", "<f4"), ("ring", "<u2"), ("time", "<f4")])
    np.testing.assert_allclose(rec["x"], scans[0][:, 0], rtol=1e-6)
    np.testing.assert_allclose(rec["intensity"], scans[0][:, 3], rtol=1e-6)
    assert sec == 1700000000

    # deserialize the first Imu: angular velocity + linear acceleration
    raw, _ = imu[0]
    off = 0
    (seq,) = struct.unpack_from("<I", raw, off); off += 4
    off += 8  # stamp
    (flen,) = struct.unpack_from("<I", raw, off); off += 4 + flen
    off += 4 * 8 + 9 * 8  # orientation + its covariance
    gyr = struct.unpack_from("<3d", raw, off); off += 3 * 8 + 9 * 8
    acc = struct.unpack_from("<3d", raw, off)
    np.testing.assert_allclose(gyr, imu_vals[0][1], rtol=1e-9)
    np.testing.assert_allclose(acc, imu_vals[0][0], rtol=1e-9)


def test_bag_header_and_sizes(tmp_path, rng):
    """Bag header is padded to 4096 bytes and rewritten with the index pos."""
    path = str(tmp_path / "t.bag")
    with BagWriter(path) as bag:
        raw = serialize_imu(0, 1.5, "f", (0, 0, 9.8), (0, 0, 0))
        bag.write("/kitti/oxts/imu", "sensor_msgs/Imu", raw, 1.5)
    blob = open(path, "rb").read()
    assert blob.startswith(b"#ROSBAG V2.0\n")
    # header record begins right after the version line and spans 4096 bytes
    (hlen,) = struct.unpack_from("<I", blob, 13)
    fields = blob[17 : 17 + hlen]
    assert b"index_pos=" in fields and b"chunk_count=" in fields
    i = fields.index(b"index_pos=") + len(b"index_pos=")
    (index_pos,) = struct.unpack_from("<Q", fields, i)
    assert 0 < index_pos < len(blob)  # rewritten, points inside the file
