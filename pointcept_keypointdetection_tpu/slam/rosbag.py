"""Pure-Python rosbag V2.0 writer (no ROS dependency).

Parity surface: the reference's SemanticFAST-LIO2 bridge writes
``/kitti/velodyne`` sensor_msgs/PointCloud2 + ``/kitti/oxts/imu``
sensor_msgs/Imu bags for an external FAST-LIO2 node
(`SemanticFAST-LIO2-prediction/fusion_clean_bag.py:55-110`).  The reference
relies on the ``rosbag``/``rospy`` python packages; this image has no ROS, so
the bag container (format spec: http://wiki.ros.org/Bags/Format/2.0) and the
two message serializations are implemented directly.

Layout written: bag header record (padded to 4096 bytes), one uncompressed
chunk per ~N messages (connection records inlined before first use), index
data records per connection per chunk, trailing connection + chunk-info
records — the standard layout `rosbag record` produces, readable by rosbag
play / rqt_bag / rosbags.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

_OP_MSG = 0x02
_OP_BAG_HEADER = 0x03
_OP_INDEX = 0x04
_OP_CHUNK = 0x05
_OP_CHUNK_INFO = 0x06
_OP_CONNECTION = 0x07


def _field(name: str, value: bytes) -> bytes:
    payload = name.encode() + b"=" + value
    return struct.pack("<I", len(payload)) + payload

def _header(fields: Dict[str, bytes]) -> bytes:
    body = b"".join(_field(k, v) for k, v in fields.items())
    return struct.pack("<I", len(body)) + body

def _record(fields: Dict[str, bytes], data: bytes) -> bytes:
    return _header(fields) + struct.pack("<I", len(data)) + data

def _time(sec: int, nsec: int) -> bytes:
    return struct.pack("<II", sec, nsec)

def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def split_stamp(t: float) -> Tuple[int, int]:
    sec = int(t)
    nsec = int(round((t - sec) * 1e9))
    if nsec >= 1_000_000_000:
        sec, nsec = sec + 1, nsec - 1_000_000_000
    return sec, nsec


def serialize_header_msg(seq: int, stamp: float, frame_id: str) -> bytes:
    sec, nsec = split_stamp(stamp)
    return struct.pack("<I", seq) + _time(sec, nsec) + _string(frame_id)


# (name, offset, datatype, count); datatypes: 1=INT8 2=UINT8 3=INT16 4=UINT16
# 5=INT32 6=UINT32 7=FLOAT32 8=FLOAT64
KITTI_POINT_FIELDS = (
    ("x", 0, 7, 1),
    ("y", 4, 7, 1),
    ("z", 8, 7, 1),
    ("intensity", 12, 7, 1),
    ("ring", 16, 4, 1),
    ("time", 18, 7, 1),
)
KITTI_POINT_STEP = 22


def serialize_pointcloud2(
    seq: int,
    stamp: float,
    frame_id: str,
    data: bytes,
    width: int,
    fields=KITTI_POINT_FIELDS,
    point_step: int = KITTI_POINT_STEP,
    is_dense: bool = False,
) -> bytes:
    """sensor_msgs/PointCloud2 wire format."""
    out = [serialize_header_msg(seq, stamp, frame_id)]
    out.append(struct.pack("<II", 1, width))  # height, width
    out.append(struct.pack("<I", len(fields)))
    for name, offset, datatype, count in fields:
        out.append(_string(name) + struct.pack("<IBI", offset, datatype, count))
    out.append(struct.pack("<B", 0))  # is_bigendian
    out.append(struct.pack("<II", point_step, point_step * width))
    out.append(struct.pack("<I", len(data)) + data)
    out.append(struct.pack("<B", 1 if is_dense else 0))
    return b"".join(out)


def pack_kitti_scan(points_xyzi: np.ndarray) -> bytes:
    """(N, 4) float32 xyz+intensity -> the reference's structured layout
    (x, y, z, intensity f32; ring u16 = 0; time f32 = 0)
    (`fusion_clean_bag.py:17-27`)."""
    dt = np.dtype(
        [("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("intensity", "<f4"), ("ring", "<u2"), ("time", "<f4")]
    )
    rec = np.zeros(points_xyzi.shape[0], dtype=dt)
    rec["x"], rec["y"], rec["z"] = points_xyzi[:, 0], points_xyzi[:, 1], points_xyzi[:, 2]
    rec["intensity"] = points_xyzi[:, 3]
    return rec.tobytes()


def serialize_imu(
    seq: int,
    stamp: float,
    frame_id: str,
    lin_acc: Tuple[float, float, float],
    ang_vel: Tuple[float, float, float],
    orientation=(0.0, 0.0, 0.0, 1.0),
) -> bytes:
    """sensor_msgs/Imu wire format (covariances zeroed, like the reference)."""
    out = [serialize_header_msg(seq, stamp, frame_id)]
    out.append(struct.pack("<4d", *orientation))
    out.append(struct.pack("<9d", *([0.0] * 9)))
    out.append(struct.pack("<3d", *ang_vel))
    out.append(struct.pack("<9d", *([0.0] * 9)))
    out.append(struct.pack("<3d", *lin_acc))
    out.append(struct.pack("<9d", *([0.0] * 9)))
    return b"".join(out)


POINTCLOUD2_MD5 = "1158d486dd51d683ce2f1be655c3c181"
POINTCLOUD2_DEF = """# This message holds a collection of N-dimensional points.
std_msgs/Header header
uint32 height
uint32 width
sensor_msgs/PointField[] fields
bool    is_bigendian
uint32  point_step
uint32  row_step
uint8[] data
bool is_dense
================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
================================================================================
MSG: sensor_msgs/PointField
uint8 INT8    = 1
uint8 UINT8   = 2
uint8 INT16   = 3
uint8 UINT16  = 4
uint8 INT32   = 5
uint8 UINT32  = 6
uint8 FLOAT32 = 7
uint8 FLOAT64 = 8
string name
uint32 offset
uint8  datatype
uint32 count
"""
IMU_MD5 = "6a62c6daae103f4ff57a132d6f95cec2"
IMU_DEF = """# This is a message to hold data from an IMU (Inertial Measurement Unit)
std_msgs/Header header
geometry_msgs/Quaternion orientation
float64[9] orientation_covariance
geometry_msgs/Vector3 angular_velocity
float64[9] angular_velocity_covariance
geometry_msgs/Vector3 linear_acceleration
float64[9] linear_acceleration_covariance
================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
================================================================================
MSG: geometry_msgs/Quaternion
float64 x
float64 y
float64 z
float64 w
================================================================================
MSG: geometry_msgs/Vector3
float64 x
float64 y
float64 z
"""


class BagWriter:
    """Minimal rosbag V2.0 writer: ``write(topic, msgtype, raw_bytes, stamp)``.

    Messages accumulate into uncompressed chunks flushed every
    ``chunk_threshold`` bytes; ``close()`` writes the index section."""

    TYPES = {
        "sensor_msgs/PointCloud2": (POINTCLOUD2_MD5, POINTCLOUD2_DEF),
        "sensor_msgs/Imu": (IMU_MD5, IMU_DEF),
    }

    def __init__(self, path: str, chunk_threshold: int = 768 * 1024):
        self._f = open(path, "wb")
        self._f.write(b"#ROSBAG V2.0\n")
        self.chunk_threshold = chunk_threshold
        self._conns: Dict[str, int] = {}  # topic -> conn id
        self._conn_records: List[bytes] = []
        self._chunk_buf: List[bytes] = []
        self._chunk_size = 0
        self._chunk_index: Dict[int, List[Tuple[int, int, int]]] = {}  # conn -> [(sec, nsec, offset)]
        self._chunk_conns_written: set = set()
        self._chunk_infos: List[Tuple[int, Tuple[int, int], Tuple[int, int], Dict[int, int]]] = []
        self._bag_header_pos = self._f.tell()
        self._write_bag_header(0, 0, 0)  # placeholder, rewritten on close

    def _write_bag_header(self, index_pos: int, conn_count: int, chunk_count: int):
        fields = {
            "op": bytes([_OP_BAG_HEADER]),
            "index_pos": struct.pack("<Q", index_pos),
            "conn_count": struct.pack("<I", conn_count),
            "chunk_count": struct.pack("<I", chunk_count),
        }
        header = _header(fields)
        # the bag header record is padded with ASCII spaces to 4096 bytes total
        pad = 4096 - len(header) - 4
        self._f.write(header + struct.pack("<I", pad) + b" " * pad)

    def _connection(self, topic: str, msgtype: str) -> int:
        if topic in self._conns:
            return self._conns[topic]
        conn = len(self._conns)
        self._conns[topic] = conn
        md5, deftext = self.TYPES[msgtype]
        # the data section of a connection record is a field list WITHOUT its
        # own length prefix (the record's data_len already delimits it)
        conn_data = b"".join(
            _field(k, v)
            for k, v in {
                "topic": topic.encode(),
                "type": msgtype.encode(),
                "md5sum": md5.encode(),
                "message_definition": deftext.encode(),
            }.items()
        )
        rec = _record(
            {"op": bytes([_OP_CONNECTION]), "conn": struct.pack("<I", conn), "topic": topic.encode()},
            conn_data,
        )
        self._conn_records.append(rec)
        return conn

    def write(self, topic: str, msgtype: str, raw: bytes, stamp: float):
        conn = self._connection(topic, msgtype)
        sec, nsec = split_stamp(stamp)
        if conn not in self._chunk_conns_written:
            # connection records repeat inside each chunk before first use
            self._chunk_buf.append(self._conn_records[conn])
            self._chunk_size += len(self._conn_records[conn])
            self._chunk_conns_written.add(conn)
        offset = self._chunk_size
        rec = _record(
            {"op": bytes([_OP_MSG]), "conn": struct.pack("<I", conn), "time": _time(sec, nsec)},
            raw,
        )
        self._chunk_buf.append(rec)
        self._chunk_size += len(rec)
        self._chunk_index.setdefault(conn, []).append((sec, nsec, offset))
        if self._chunk_size >= self.chunk_threshold:
            self._flush_chunk()

    def _flush_chunk(self):
        if not self._chunk_buf:
            return
        chunk_pos = self._f.tell()
        data = b"".join(self._chunk_buf)
        self._f.write(
            _record(
                {"op": bytes([_OP_CHUNK]), "compression": b"none", "size": struct.pack("<I", len(data))},
                data,
            )
        )
        times = [t for idx in self._chunk_index.values() for t in idx]
        start = min((s, n) for s, n, _ in times)
        end = max((s, n) for s, n, _ in times)
        counts = {}
        for conn, idx in sorted(self._chunk_index.items()):
            counts[conn] = len(idx)
            entry = b"".join(struct.pack("<III", s, n, off) for s, n, off in idx)
            self._f.write(
                _record(
                    {
                        "op": bytes([_OP_INDEX]),
                        "ver": struct.pack("<I", 1),
                        "conn": struct.pack("<I", conn),
                        "count": struct.pack("<I", len(idx)),
                    },
                    entry,
                )
            )
        self._chunk_infos.append((chunk_pos, start, end, counts))
        self._chunk_buf = []
        self._chunk_size = 0
        self._chunk_index = {}
        self._chunk_conns_written = set()

    def close(self):
        self._flush_chunk()
        index_pos = self._f.tell()
        for rec in self._conn_records:
            self._f.write(rec)
        for chunk_pos, (ss, sn), (es, en), counts in self._chunk_infos:
            data = b"".join(struct.pack("<II", c, n) for c, n in sorted(counts.items()))
            self._f.write(
                _record(
                    {
                        "op": bytes([_OP_CHUNK_INFO]),
                        "ver": struct.pack("<I", 1),
                        "chunk_pos": struct.pack("<Q", chunk_pos),
                        "start_time": _time(ss, sn),
                        "end_time": _time(es, en),
                        "count": struct.pack("<I", len(counts)),
                    },
                    data,
                )
            )
        self._f.seek(self._bag_header_pos)
        self._write_bag_header(index_pos, len(self._conns), len(self._chunk_infos))
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# Minimal reader (tests / inspection — parses the records written above)
# ---------------------------------------------------------------------------

def _parse_header(buf: bytes) -> Dict[str, bytes]:
    fields = {}
    i = 0
    while i < len(buf):
        (flen,) = struct.unpack_from("<I", buf, i)
        i += 4
        k, _, v = buf[i : i + flen].partition(b"=")
        fields[k.decode()] = v
        i += flen
    return fields


def read_bag(path: str):
    """Yield (topic, msgtype, raw_bytes, (sec, nsec)) from a V2.0 bag."""
    with open(path, "rb") as f:
        assert f.readline() == b"#ROSBAG V2.0\n", "not a rosbag V2.0 file"
        conns: Dict[int, Tuple[str, str]] = {}

        def records(stream_read, remaining=None):
            while True:
                raw = stream_read(4)
                if len(raw) < 4:
                    return
                (hlen,) = struct.unpack("<I", raw)
                header = _parse_header(stream_read(hlen))
                (dlen,) = struct.unpack("<I", stream_read(4))
                data = stream_read(dlen)
                yield header, data

        for header, data in records(f.read):
            op = header["op"][0]
            if op == _OP_CHUNK:
                assert header["compression"] == b"none"
                pos = [0]

                def chunk_read(n, _d=data, _p=pos):
                    out = _d[_p[0] : _p[0] + n]
                    _p[0] += n
                    return out

                for ch, cd in records(chunk_read):
                    cop = ch["op"][0]
                    if cop == _OP_CONNECTION:
                        cfields = _parse_header(cd)
                        (conn_id,) = struct.unpack("<I", ch["conn"])
                        conns[conn_id] = (ch["topic"].decode(), cfields["type"].decode())
                    elif cop == _OP_MSG:
                        (conn_id,) = struct.unpack("<I", ch["conn"])
                        sec, nsec = struct.unpack("<II", ch["time"])
                        topic, msgtype = conns[conn_id]
                        yield topic, msgtype, cd, (sec, nsec)
