"""Filesystem abstraction for lake/state paths.

Lake roots may be plain POSIX paths or ``pyarrow.fs`` URIs (``s3://…``,
``gs://…``, ``hdfs://…``, ``file://…``) — every lake/manifest/checkpoint
touch point resolves through here so a multi-node cluster needs no shared
POSIX mount (SCALE.md roadmap item 1).

Atomicity model:
- Local filesystems publish via tmp-file + rename (POSIX atomic).
- Object stores have no rename, but a single PUT is atomically visible, so
  publishes write the final key directly (`put_is_atomic`). Readers resolve
  state through the manifest/checkpoint JSON, so a half-uploaded data file
  is never referenced either way.
"""

from __future__ import annotations

import posixpath

import pyarrow.fs as pafs


def resolve(path: str, filesystem: pafs.FileSystem | None = None) -> tuple[pafs.FileSystem, str]:
    """(filesystem, fs-local path) for a path or URI."""
    if filesystem is not None:
        return filesystem, path
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _rename_is_atomic(fs: pafs.FileSystem) -> bool:
    base = fs.base_fs if isinstance(fs, pafs.SubTreeFileSystem) else fs
    return isinstance(base, (pafs.LocalFileSystem, pafs._MockFileSystem))


def join(*parts: str) -> str:
    return posixpath.join(*parts)


def makedirs(fs: pafs.FileSystem, path: str) -> None:
    fs.create_dir(path, recursive=True)


def exists(fs: pafs.FileSystem, path: str) -> bool:
    return fs.get_file_info(path).type != pafs.FileType.NotFound


def listdir(fs: pafs.FileSystem, path: str) -> list[pafs.FileInfo]:
    if not exists(fs, path):
        return []
    return fs.get_file_info(pafs.FileSelector(path, allow_not_found=True))


def read_bytes(fs: pafs.FileSystem, path: str) -> bytes:
    with fs.open_input_stream(path) as f:
        return f.read()


def write_bytes_atomic(fs: pafs.FileSystem, path: str, data: bytes) -> None:
    """Atomically publish ``data`` at ``path`` (see module docstring)."""
    if _rename_is_atomic(fs):
        tmp = path + ".tmp"
        with fs.open_output_stream(tmp) as f:
            f.write(data)
        fs.move(tmp, path)
    else:  # object store: single PUT is atomically visible
        with fs.open_output_stream(path) as f:
            f.write(data)


def staging_path(fs: pafs.FileSystem, path: str) -> str:
    """Where to WRITE a file that will be published at ``path``: a .tmp
    sibling when rename is atomic, the final path itself on object stores
    (single PUT is the atomic publish)."""
    return path + ".tmp" if _rename_is_atomic(fs) else path


def publish_file(fs: pafs.FileSystem, staged: str, path: str) -> None:
    """Publish a file written at ``staging_path`` to its final path."""
    if staged != path:
        fs.move(staged, path)


class ConcurrentWriteError(RuntimeError):
    """Another writer already claimed this epoch (or a crashed writer left
    a stale claim — see TableManifest.abandon_epoch)."""


def create_exclusive(fs: pafs.FileSystem, path: str, data: bytes) -> None:
    """Atomically create ``path`` with ``data``; raise ConcurrentWriteError
    if it already exists. Local filesystems get a true O_CREAT|O_EXCL CAS;
    object stores get existence-check + PUT (best-effort — exact on stores
    with conditional PUT once pyarrow exposes it)."""
    if isinstance(fs, pafs.LocalFileSystem):
        import os

        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        except FileExistsError:
            raise ConcurrentWriteError(path) from None
        with os.fdopen(fd, "wb") as f:
            f.write(data)
    else:
        if exists(fs, path):
            raise ConcurrentWriteError(path)
        with fs.open_output_stream(path) as f:
            f.write(data)


def delete_file(fs: pafs.FileSystem, path: str) -> None:
    fs.delete_file(path)


def file_size(fs: pafs.FileSystem, path: str) -> int:
    info = fs.get_file_info(path)
    return int(info.size or 0)
