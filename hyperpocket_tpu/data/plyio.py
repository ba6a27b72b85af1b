"""Fast general PLY point-cloud I/O.

Replaces the reference's vendored python-plyfile library (utils/plyfile.py)
for the two operations the pipeline uses:

* ``load_ply(path) -> (N, 3) float32`` — reads the x/y/z vertex properties
  (reference ``load_ply``, utils/plyfile.py:919-941) from ascii,
  binary_little_endian or binary_big_endian files, with elements in any
  order and list properties anywhere (skipped) — the full capability
  envelope of plyfile's reader, scoped to the (N, 3) output. Common layouts
  (vertex first, scalar properties) hit a one-shot structured ``fromfile``;
  exotic ones fall back to a row walker.
* ``save_ply(path, points)`` — binary little-endian writer, identical file
  layout to the reference's ``quick_save_ply_file`` (utils/plyfile.py:944-962).

Beyond the pipeline's needs, ``load_ply_elements`` / ``save_ply_elements``
cover the vendored library's FULL generality (utils/plyfile.py:153-916):
arbitrary elements, scalar properties of any PLY type, list properties with
explicit count/value types, ascii and both binary endiannesses, comments —
so meshes (vertex+face) and annotated clouds round-trip losslessly.

A native C++ fast path (``hyperpocket_tpu.data.native``) is used when the
shared library has been built; this module is the pure-numpy fallback and the
correctness oracle for it.
"""

from __future__ import annotations

import os

import numpy as np

_PLY_TO_NUMPY = {
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
}
_LIST_SIZE = {"uchar": 1, "uint8": 1, "char": 1, "int8": 1,
              "ushort": 2, "uint16": 2, "short": 2, "int16": 2,
              "uint": 4, "uint32": 4, "int": 4, "int32": 4}


class PlyParseError(ValueError):
    pass


def _parse_header(f) -> tuple[str, list[tuple[str, int, list[tuple[str, str]]]], int]:
    magic = f.readline().strip()
    if magic != b"ply":
        raise PlyParseError("not a PLY file (missing 'ply' magic)")
    fmt = None
    elements: list[tuple[str, int, list[tuple[str, str]]]] = []
    while True:
        line = f.readline()
        if not line:
            raise PlyParseError("unterminated PLY header")
        tokens = line.decode("ascii", "replace").strip().split()
        if not tokens or tokens[0] == "comment" or tokens[0] == "obj_info":
            continue
        if tokens[0] == "format":
            fmt = tokens[1]
        elif tokens[0] == "element":
            elements.append((tokens[1], int(tokens[2]), []))
        elif tokens[0] == "property":
            if not elements:
                raise PlyParseError("property before element")
            if tokens[1] == "list":
                # (name, "list:<count_type>:<value_type>")
                elements[-1][2].append((tokens[-1], f"list:{tokens[2]}:{tokens[3]}"))
            else:
                elements[-1][2].append((tokens[-1], tokens[1]))
        elif tokens[0] == "end_header":
            break
    if fmt is None:
        raise PlyParseError("PLY header missing format line")
    return fmt, elements, f.tell()


def load_ply(path: str | os.PathLike) -> np.ndarray:
    """Read the vertex x/y/z columns of a PLY file -> (N, 3) float32.

    Uses the native C++ reader when built (binary little-endian files),
    falling back to the numpy parser for everything else.
    """
    from hyperpocket_tpu.data import native

    if native.available():
        try:
            return native.load_ply(path)
        except Exception:
            pass  # ascii/odd files: numpy path below
    return _load_ply_numpy(path)


def _tsize(t: str) -> int:
    return int(np.dtype(_PLY_TO_NUMPY[t]).itemsize)


def _check_vertex(path, elements):
    vertex = next((e for e in elements if e[0] == "vertex"), None)
    if vertex is None:
        raise PlyParseError(f"{path}: no vertex element")
    names = [n for n, _ in vertex[2]]
    for axis in ("x", "y", "z"):
        if axis not in names:
            raise PlyParseError(f"{path}: vertex missing property {axis!r}")
    return vertex


def _load_ply_numpy(path: str | os.PathLike) -> np.ndarray:
    """General PLY vertex reader: ascii / binary little- and big-endian,
    elements in any order, list properties anywhere (skipped; on the vertex
    element the scalar x/y/z are still extracted) — the capability envelope
    of the reference's vendored plyfile (utils/plyfile.py:153-917), scoped
    to producing the (N, 3) cloud the pipeline consumes."""
    with open(path, "rb") as f:
        fmt, elements, _ = _parse_header(f)
        vertex = _check_vertex(path, elements)
        if fmt == "ascii":
            return _read_vertices_ascii(path, f, elements, vertex)
        if fmt == "binary_little_endian":
            endian = "<"
        elif fmt == "binary_big_endian":
            endian = ">"
        else:
            raise PlyParseError(f"{path}: unsupported PLY format {fmt!r}")
        return _read_vertices_binary(path, f, elements, vertex, endian)


def _read_vertices_binary(path, f, elements, vertex, endian) -> np.ndarray:
    _, count, vprops = vertex
    first_is_vertex = elements[0][0] == "vertex"
    has_list = any(t.startswith("list:") for _, t in vprops)
    if first_is_vertex and not has_list:
        # fast path: one structured fromfile straight out of the header
        dtype = np.dtype([(n, endian + _PLY_TO_NUMPY[t]) for n, t in vprops])
        raw = np.fromfile(f, dtype=dtype, count=count)
        if raw.shape[0] != count:
            raise PlyParseError(f"{path}: truncated vertex data")
        out = np.empty((count, 3), dtype=np.float32)
        for i, axis in enumerate(("x", "y", "z")):
            out[:, i] = raw[axis]
        return out

    buf = f.read()
    pos = 0
    out = None

    def read_scalar(ptype: str, at: int):
        size = _tsize(ptype)
        if at + size > len(buf):
            raise PlyParseError(f"{path}: truncated element data")
        (v,) = np.frombuffer(buf, endian + _PLY_TO_NUMPY[ptype], count=1, offset=at)
        return v

    for name, n_rows, props in elements:
        is_vertex = name == "vertex"
        lists = [n for n, t in props if t.startswith("list:")]
        if not lists:
            dtype = np.dtype([(n, endian + _PLY_TO_NUMPY[t]) for n, t in props])
            end = pos + dtype.itemsize * n_rows
            if end > len(buf):
                raise PlyParseError(f"{path}: truncated element {name!r}")
            if is_vertex:
                raw = np.frombuffer(buf, dtype=dtype, count=n_rows, offset=pos)
                out = np.stack([raw["x"], raw["y"], raw["z"]], axis=1).astype(np.float32)
                return out  # elements after vertex cannot affect the output
            pos = end
            continue
        # variable-width rows: walk scalar-by-scalar, skipping list payloads
        if is_vertex:
            out = np.empty((n_rows, 3), dtype=np.float32)
        for r in range(n_rows):
            row: dict[str, float] = {}
            for pname, ptype in props:
                if ptype.startswith("list:"):
                    _, ct, vt = ptype.split(":")
                    k = int(read_scalar(ct, pos))
                    pos += _tsize(ct) + k * _tsize(vt)
                    if pos > len(buf):
                        raise PlyParseError(f"{path}: truncated element {name!r}")
                else:
                    if is_vertex and pname in ("x", "y", "z"):
                        row[pname] = read_scalar(ptype, pos)
                    pos += _tsize(ptype)
            if pos > len(buf):
                raise PlyParseError(f"{path}: truncated element {name!r}")
            if is_vertex:
                out[r] = (row["x"], row["y"], row["z"])
        if is_vertex:
            return out  # skip any trailing elements (old reader's behavior)
    return out


def _read_vertices_ascii(path, f, elements, vertex) -> np.ndarray:
    _, count, vprops = vertex
    names = [n for n, _ in vprops]
    before = elements[: [e[0] for e in elements].index("vertex")]
    # ascii rows are one line each regardless of list properties, so
    # skipping earlier elements is just a line count
    rows_to_skip = sum(e[1] for e in before)
    if not any(t.startswith("list:") for _, t in vprops):
        data = np.loadtxt(
            path,
            skiprows=_count_header_lines(path) + rows_to_skip,
            max_rows=count,
            dtype=np.float64,
            usecols=[names.index("x"), names.index("y"), names.index("z")],
            ndmin=2,
        )
        return np.ascontiguousarray(data, dtype=np.float32)
    # vertex rows interleave list payloads: walk tokens per line
    for _ in range(rows_to_skip):
        f.readline()
    out = np.empty((count, 3), dtype=np.float32)
    for r in range(count):
        tokens = f.readline().split()
        if not tokens:
            raise PlyParseError(f"{path}: truncated vertex data")
        i = 0
        row: dict[str, float] = {}
        for pname, _ptype in vprops:
            if _ptype.startswith("list:"):
                i += 1 + int(tokens[i])
            else:
                if pname in ("x", "y", "z"):
                    row[pname] = float(tokens[i])
                i += 1
        out[r] = (row["x"], row["y"], row["z"])
    return out


def _count_header_lines(path) -> int:
    with open(path, "rb") as f:
        n = 0
        for line in f:
            n += 1
            if line.strip() == b"end_header":
                return n
    raise PlyParseError("unterminated PLY header")


# ---------------------------------------------------------------------------
# General element/property API — the vendored plyfile's full write/read
# envelope (reference utils/plyfile.py:364-916), for meshes and annotated
# clouds beyond the (N, 3) pipeline artifacts.

_NUMPY_TO_PLY = {
    "f4": "float", "f8": "double", "i1": "char", "u1": "uchar",
    "i2": "short", "u2": "ushort", "i4": "int", "u4": "uint",
}


class ListProperty:
    """A PLY list property: per-row variable-length 1-D arrays.

    ``count_type``/``value_type`` are PLY type names (e.g. "uchar", "int"),
    matching plyfile's per-property len_dtype/val_dtype (utils/plyfile.py:670).
    """

    def __init__(self, rows, count_type: str = "uchar", value_type: str = "int"):
        if count_type not in _PLY_TO_NUMPY or value_type not in _PLY_TO_NUMPY:
            raise ValueError(f"unknown PLY type {count_type!r}/{value_type!r}")
        self.rows = [np.asarray(r, dtype=_PLY_TO_NUMPY[value_type]) for r in rows]
        # validate row lengths against the count dtype's range UP FRONT: an
        # overflow discovered mid-write would leave a truncated/corrupt file
        # (numpy>=2 raises on out-of-range casts, numpy 1.x silently wraps)
        count_max = np.iinfo(_PLY_TO_NUMPY[count_type]).max
        for i, r in enumerate(self.rows):
            if len(r) > count_max:
                raise ValueError(
                    f"list row {i} has {len(r)} elements, which overflows "
                    f"count_type {count_type!r} (max {count_max})"
                )
        self.count_type = count_type
        self.value_type = value_type

    def __len__(self):
        return len(self.rows)

    def __eq__(self, other):
        return (
            isinstance(other, ListProperty)
            and self.count_type == other.count_type
            and self.value_type == other.value_type
            and len(self.rows) == len(other.rows)
            and all(np.array_equal(a, b) for a, b in zip(self.rows, other.rows))
        )


def _ply_type_name(arr: np.ndarray) -> str:
    code = arr.dtype.str.lstrip("<>|=")
    if code not in _NUMPY_TO_PLY:
        raise ValueError(f"dtype {arr.dtype} has no PLY scalar type")
    return _NUMPY_TO_PLY[code]


def save_ply_elements(path, elements, fmt: str = "binary_little_endian",
                      comments=()) -> None:
    """Write arbitrary PLY content (plyfile's PlyData.write envelope).

    ``elements``: sequence of ``(name, props)``; ``props``: sequence of
    ``(prop_name, data)`` where data is a 1-D numpy array (scalar property,
    PLY type from its dtype) or a :class:`ListProperty`. All properties of an
    element must agree on length. ``fmt``: ascii / binary_little_endian /
    binary_big_endian.
    """
    if fmt not in ("ascii", "binary_little_endian", "binary_big_endian"):
        raise ValueError(f"unsupported PLY format {fmt!r}")
    endian = ">" if fmt == "binary_big_endian" else "<"
    lines = ["ply", f"format {fmt} 1.0"]
    lines += [f"comment {c}" for c in comments]
    norm = []
    for name, props in elements:
        counts = {len(d) for _, d in props}
        if len(counts) != 1:
            raise ValueError(f"element {name!r}: property lengths differ: {counts}")
        (count,) = counts
        lines.append(f"element {name} {count}")
        nprops = []
        for pname, data in props:
            if isinstance(data, ListProperty):
                lines.append(f"property list {data.count_type} {data.value_type} {pname}")
                nprops.append((pname, data))
            else:
                arr = np.asarray(data)
                if arr.ndim != 1:
                    raise ValueError(f"scalar property {name}.{pname} must be 1-D")
                lines.append(f"property {_ply_type_name(arr)} {pname}")
                nprops.append((pname, arr))
        norm.append((name, count, nprops))
    lines.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(lines) + "\n").encode("ascii"))
        for name, count, nprops in norm:
            if fmt == "ascii":
                for r in range(count):
                    toks = []
                    for _, data in nprops:
                        if isinstance(data, ListProperty):
                            row = data.rows[r]
                            toks.append(str(len(row)))
                            toks += [_ascii_scalar(v) for v in row]
                        else:
                            toks.append(_ascii_scalar(data[r]))
                    f.write((" ".join(toks) + "\n").encode("ascii"))
            elif not any(isinstance(d, ListProperty) for _, d in nprops):
                dtype = np.dtype([(p, endian + data.dtype.str.lstrip("<>|="))
                                  for p, data in nprops])
                rec = np.empty(count, dtype=dtype)
                for pname, data in nprops:
                    rec[pname] = data
                f.write(rec.tobytes())
            else:
                for r in range(count):
                    for _, data in nprops:
                        if isinstance(data, ListProperty):
                            row = data.rows[r]
                            f.write(np.asarray(len(row), dtype=endian + _PLY_TO_NUMPY[data.count_type]).tobytes())
                            f.write(row.astype(endian + _PLY_TO_NUMPY[data.value_type]).tobytes())
                        else:
                            f.write(np.asarray(data[r], dtype=endian + data.dtype.str.lstrip("<>|=")).tobytes())


def _ascii_scalar(v) -> str:
    # integers print exactly; floats use repr for round-trip fidelity
    if np.issubdtype(np.asarray(v).dtype, np.integer):
        return str(int(v))
    return repr(float(v))


def load_ply_elements(path):
    """Read a PLY file in full: every element, scalar and list properties.

    Returns ``[(element_name, [(prop_name, data), ...]), ...]`` mirroring the
    ``save_ply_elements`` input structure (scalars as native-endian 1-D
    arrays, lists as :class:`ListProperty`) — the read envelope of the
    vendored plyfile (utils/plyfile.py:153-362).
    """
    with open(path, "rb") as f:
        fmt, elements, _ = _parse_header(f)
        if fmt == "ascii":
            return _load_elements_ascii(path, f, elements)
        if fmt == "binary_little_endian":
            endian = "<"
        elif fmt == "binary_big_endian":
            endian = ">"
        else:
            raise PlyParseError(f"{path}: unsupported PLY format {fmt!r}")
        return _load_elements_binary(path, f, elements, endian)


def _header_props(props):
    """Header property entries -> (name, kind, dtypes) with list types split."""
    out = []
    for pname, ptype in props:
        if ptype.startswith("list:"):
            _, ct, vt = ptype.split(":")
            out.append((pname, "list", (ct, vt)))
        else:
            out.append((pname, "scalar", ptype))
    return out


def _load_elements_binary(path, f, elements, endian):
    buf = f.read()
    pos = 0
    result = []
    for name, n_rows, props in elements:
        hp = _header_props(props)
        if all(kind == "scalar" for _, kind, _ in hp):
            dtype = np.dtype([(p, endian + _PLY_TO_NUMPY[t]) for p, _, t in hp])
            end = pos + dtype.itemsize * n_rows
            if end > len(buf):
                raise PlyParseError(f"{path}: truncated element {name!r}")
            rec = np.frombuffer(buf, dtype=dtype, count=n_rows, offset=pos)
            result.append((name, [(p, np.ascontiguousarray(rec[p]).astype(
                rec[p].dtype.newbyteorder("="))) for p, _, _ in hp]))
            pos = end
            continue
        cols: dict[str, list] = {p: [] for p, _, _ in hp}
        for _ in range(n_rows):
            for p, kind, t in hp:
                if kind == "list":
                    ct, vt = t
                    csize, vsize = _tsize(ct), _tsize(vt)
                    if pos + csize > len(buf):
                        raise PlyParseError(f"{path}: truncated element {name!r}")
                    (k,) = np.frombuffer(buf, endian + _PLY_TO_NUMPY[ct], count=1, offset=pos)
                    pos += csize
                    k = int(k)
                    if pos + k * vsize > len(buf):
                        raise PlyParseError(f"{path}: truncated element {name!r}")
                    cols[p].append(np.frombuffer(buf, endian + _PLY_TO_NUMPY[vt],
                                                 count=k, offset=pos).astype(_PLY_TO_NUMPY[vt]))
                    pos += k * vsize
                else:
                    size = _tsize(t)
                    if pos + size > len(buf):
                        raise PlyParseError(f"{path}: truncated element {name!r}")
                    (v,) = np.frombuffer(buf, endian + _PLY_TO_NUMPY[t], count=1, offset=pos)
                    cols[p].append(v)
                    pos += size
        result.append((name, [
            (p, ListProperty(cols[p], *t) if kind == "list"
             else np.asarray(cols[p], dtype=_PLY_TO_NUMPY[t]))
            for p, kind, t in hp
        ]))
    return result


def _load_elements_ascii(path, f, elements):
    result = []
    for name, n_rows, props in elements:
        hp = _header_props(props)
        cols: dict[str, list] = {p: [] for p, _, _ in hp}
        for _ in range(n_rows):
            tokens = f.readline().split()
            if not tokens and hp:
                raise PlyParseError(f"{path}: truncated element {name!r}")
            i = 0
            for p, kind, t in hp:
                if kind == "list":
                    ct, vt = t
                    k = int(tokens[i])
                    cols[p].append(np.array(tokens[i + 1 : i + 1 + k],
                                            dtype=_PLY_TO_NUMPY[vt]))
                    i += 1 + k
                else:
                    cols[p].append(np.dtype(_PLY_TO_NUMPY[t]).type(float(tokens[i]))
                                   if t in ("float", "float32", "double", "float64")
                                   else int(tokens[i]))
                    i += 1
        result.append((name, [
            (p, ListProperty(cols[p], *t) if kind == "list"
             else np.asarray(cols[p], dtype=_PLY_TO_NUMPY[t]))
            for p, kind, t in hp
        ]))
    return result


def save_ply(path: str | os.PathLike, points: np.ndarray) -> None:
    """Write (N, 3) points as binary little-endian PLY (x, y, z float32)."""
    points = np.ascontiguousarray(points, dtype="<f4")
    if points.ndim != 2 or points.shape[1] != 3:
        raise ValueError(f"expected (N, 3) points, got {points.shape}")
    header = (
        "ply\n"
        "format binary_little_endian 1.0\n"
        f"element vertex {points.shape[0]}\n"
        "property float x\n"
        "property float y\n"
        "property float z\n"
        "end_header\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(points.tobytes())
