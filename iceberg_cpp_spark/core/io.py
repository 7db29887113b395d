"""FileIO (reference file_io.h:22-60): pluggable byte-level IO for
METADATA files (data files always go through Spark's own IO). Local
filesystem built in; any fsspec filesystem slots in where the library
is available (S3/GCS/ABFS in real deployments).
"""

from __future__ import annotations

import os
import uuid as uuid_mod
from typing import Optional


class FileIO:
    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def write_bytes(self, path: str, data: bytes, exclusive: bool = False) -> None:
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError


class LocalFileIO(FileIO):
    """Atomic local IO: tmp-file + rename (or hard-link for
    create-if-absent CAS semantics)."""

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def write_bytes(self, path: str, data: bytes, exclusive: bool = False) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{uuid_mod.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        if exclusive:
            try:
                os.link(tmp, path)
            finally:
                os.unlink(tmp)
        else:
            os.replace(tmp, path)

    def delete(self, path: str) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass

    def exists(self, path: str) -> bool:
        return os.path.exists(path)


class FsspecFileIO(FileIO):
    """Object-store IO through fsspec (import-gated: the library is not
    in this environment; real clusters have it). Exclusive-create uses
    the filesystem's atomic primitives where offered."""

    def __init__(self, protocol: str, **storage_options):
        import fsspec  # noqa: F401 — gated import

        self.fs = fsspec.filesystem(protocol, **storage_options)

    def read_bytes(self, path: str) -> bytes:
        with self.fs.open(path, "rb") as f:
            return f.read()

    def write_bytes(self, path: str, data: bytes, exclusive: bool = False) -> None:
        if exclusive and self.fs.exists(path):
            raise FileExistsError(path)
        with self.fs.open(path, "wb") as f:
            f.write(data)

    def delete(self, path: str) -> None:
        if self.fs.exists(path):
            self.fs.rm(path)

    def exists(self, path: str) -> bool:
        return self.fs.exists(path)


_default: Optional[FileIO] = None


def default_io() -> FileIO:
    global _default
    if _default is None:
        _default = LocalFileIO()
    return _default
