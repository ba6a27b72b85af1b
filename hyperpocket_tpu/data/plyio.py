"""Minimal, fast PLY point-cloud I/O.

Replaces the reference's vendored python-plyfile library (utils/plyfile.py)
for the only two operations the pipeline uses:

* ``load_ply(path) -> (N, 3) float32`` — reads the x/y/z vertex properties of
  ascii or binary_little_endian PLY files (reference ``load_ply``,
  utils/plyfile.py:919-941). Extra vertex properties are skipped; non-vertex
  elements after the vertex block are ignored.
* ``save_ply(path, points)`` — binary little-endian writer, identical file
  layout to the reference's ``quick_save_ply_file`` (utils/plyfile.py:944-962).

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
                elements[-1][2].append(("__list__", f"{tokens[2]}:{tokens[3]}"))
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


def _load_ply_numpy(path: str | os.PathLike) -> np.ndarray:
    with open(path, "rb") as f:
        fmt, elements, offset = _parse_header(f)
        vertex = next((e for e in elements if e[0] == "vertex"), None)
        if vertex is None:
            raise PlyParseError(f"{path}: no vertex element")
        _, count, props = vertex
        if any(n == "__list__" for n, _ in props):
            raise PlyParseError(f"{path}: list properties on vertex unsupported")
        names = [n for n, _ in props]
        for axis in ("x", "y", "z"):
            if axis not in names:
                raise PlyParseError(f"{path}: vertex missing property {axis!r}")
        # Skip any elements declared before vertex (unusual but legal).
        before = elements[: [e[0] for e in elements].index("vertex")]
        if fmt == "ascii":
            rows_to_skip = sum(e[1] for e in before)
            data = np.loadtxt(
                path,
                skiprows=_count_header_lines(path) + rows_to_skip,
                max_rows=count,
                dtype=np.float64,
                usecols=[names.index("x"), names.index("y"), names.index("z")],
                ndmin=2,
            )
            return np.ascontiguousarray(data, dtype=np.float32)
        if fmt != "binary_little_endian":
            raise PlyParseError(f"{path}: unsupported PLY format {fmt!r}")
        for e in before:
            raise PlyParseError(f"{path}: element {e[0]!r} before vertex unsupported in binary")
        dtype = np.dtype([(n, "<" + _PLY_TO_NUMPY[t]) for n, t in props])
        raw = np.fromfile(f, dtype=dtype, count=count, offset=0)
        if raw.shape[0] != count:
            raise PlyParseError(f"{path}: truncated vertex data")
        out = np.empty((count, 3), dtype=np.float32)
        for i, axis in enumerate(("x", "y", "z")):
            out[:, i] = raw[axis]
        return out


def _count_header_lines(path) -> int:
    with open(path, "rb") as f:
        n = 0
        for line in f:
            n += 1
            if line.strip() == b"end_header":
                return n
    raise PlyParseError("unterminated PLY header")


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
