"""Self-contained PLY reader (ascii + binary_little_endian).

The preprocessing scripts need mesh/point PLY input but the image has no
plyfile/open3d; this covers the ScanNet/S3DIS asset formats.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

_TYPES = {
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def read_ply(path: str) -> Dict[str, np.ndarray]:
    """Returns {element_name: structured array}. Handles list properties for
    faces (fixed uchar count + int indices, the ScanNet mesh layout)."""
    with open(path, "rb") as f:
        assert f.readline().strip() == b"ply", "not a PLY file"
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype) or ('list', count_t, item_t, name)])
        while True:
            line = f.readline().decode("ascii").strip()
            if line == "end_header":
                break
            parts = line.split()
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                elements.append((parts[1], int(parts[2]), []))
            elif parts[0] == "property":
                if parts[1] == "list":
                    elements[-1][2].append(("list", _TYPES[parts[2]], _TYPES[parts[3]], parts[4]))
                else:
                    elements[-1][2].append((parts[2], _TYPES[parts[1]]))

        out = {}
        for name, count, props in elements:
            has_list = any(p[0] == "list" for p in props)
            if not has_list:
                dtype = np.dtype([(p[0], "<" + p[1]) for p in props])
                if fmt == "ascii":
                    rows = [tuple(f.readline().split()) for _ in range(count)]
                    out[name] = np.array(rows, dtype=dtype)
                else:
                    out[name] = np.frombuffer(f.read(count * dtype.itemsize), dtype=dtype)
            else:
                # element with a list property, possibly mixed with scalars
                # (e.g. Matterport3D region faces: vertex_indices + category_id).
                # Assume constant list arity (triangle meshes), peeked from the
                # first row, so the whole element has one fixed row dtype.
                if fmt == "ascii":
                    rows = {p[3] if p[0] == "list" else p[0]: [] for p in props}
                    for _ in range(count):
                        vals = f.readline().split()
                        i = 0
                        for p in props:
                            if p[0] == "list":
                                k = int(vals[i])
                                rows[p[3]].append([float(v) for v in vals[i + 1 : i + 1 + k]])
                                i += 1 + k
                            else:
                                rows[p[0]].append(float(vals[i]))
                                i += 1
                    main_list = next(p[3] for p in props if p[0] == "list")
                    if len(props) == 1:
                        out[name] = np.array(rows[main_list], np.int64)
                    else:
                        out[name] = {
                            k: np.array(v, np.int64 if k == main_list else np.float64)
                            for k, v in rows.items()
                        }
                else:
                    # peek the first list count to fix the arity
                    pos = f.tell()
                    pre = 0
                    for p in props:
                        if p[0] == "list":
                            count_t = np.dtype("<" + p[1])
                            f.seek(pos + pre)
                            k = int(np.frombuffer(f.read(count_t.itemsize), count_t)[0])
                            break
                        pre += np.dtype("<" + p[1]).itemsize
                    f.seek(pos)
                    fields = []
                    main_list = None
                    for p in props:
                        if p[0] == "list":
                            fields.append(("_n_" + p[3], "<" + p[1]))
                            fields.append((p[3], "<" + p[2], (k,)))
                            main_list = p[3]
                        else:
                            fields.append((p[0], "<" + p[1]))
                    row = np.dtype(fields)
                    data = np.frombuffer(f.read(count * row.itemsize), dtype=row)
                    if len(props) == 1:
                        out[name] = data[main_list]
                    else:
                        out[name] = {
                            p[3] if p[0] == "list" else p[0]: data[p[3] if p[0] == "list" else p[0]]
                            for p in props
                        }
        return out


def vertex_arrays(ply: Dict[str, np.ndarray]) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(coord f32[N,3], color u8[N,3] or None, normal f32[N,3] or None)."""
    v = ply["vertex"]
    coord = np.stack([v["x"], v["y"], v["z"]], 1).astype(np.float32)
    names = v.dtype.names
    color = (
        np.stack([v["red"], v["green"], v["blue"]], 1).astype(np.float32)
        if "red" in names
        else None
    )
    normal = (
        np.stack([v["nx"], v["ny"], v["nz"]], 1).astype(np.float32) if "nx" in names else None
    )
    return coord, color, normal
