"""Data providers: resolve a date string to a local file path.

Functional twins of the reference providers (data_generator.py:21-93):
an abstract Provider with load/unload/provide, a local-filesystem provider
that discovers dates by matching a ``{date[:fmt]}`` filename pattern, and an
S3 provider shelling out to ``s3cmd``.  Pattern parsing is a small regex
(the ``parse`` package is not in the TPU image).
"""

from __future__ import annotations

import abc
import os
import re
import subprocess
import tempfile
from contextlib import contextmanager
from pathlib import Path
from typing import Collection


def _pattern_to_regex(pattern: str) -> "re.Pattern":
    """Turn a ``{date}``/``{date:d}``-style filename pattern into a regex
    with a ``date`` capture group."""
    out = []
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "{":
            j = pattern.index("}", i)
            field = pattern[i + 1:j]
            name = field.split(":")[0]
            if name == "date":
                out.append(r"(?P<date>\d+)")
            else:
                out.append(r".*?")
            i = j + 1
        else:
            out.append(re.escape(ch))
            i += 1
    return re.compile("^" + "".join(out) + "$")


class Provider(abc.ABC):
    available_dates: Collection[str]

    @abc.abstractmethod
    def load(self, date: str) -> os.PathLike:
        ...

    def unload(self, loaded: os.PathLike) -> None:
        pass

    @contextmanager
    def provide(self, date):
        loaded = None
        try:
            loaded = self.load(date)
            yield loaded
        finally:
            if loaded is not None:
                self.unload(loaded)


class LocalFileProvider(Provider):
    """Finds ``pattern.format(date=...)`` files under a directory."""

    def __init__(self, path_to_data: os.PathLike, pattern: str):
        self.data_path = Path(path_to_data)
        if "{date" not in pattern:
            raise ValueError("Expected a {date[:fmt]} placeholder in " + pattern)
        self.pattern = pattern
        self._regex = _pattern_to_regex(pattern)

    @property
    def available_dates(self):
        dates = set()
        for f in self.data_path.iterdir():
            m = self._regex.match(str(f.relative_to(self.data_path)))
            if m:
                dates.add(m.group("date"))
        return dates

    def load(self, date: str) -> os.PathLike:
        name = re.sub(r"\{date[^}]*\}", str(int(date)), self.pattern)
        return self.data_path / name


class GCSFileProvider(Provider):
    """Lists/downloads objects from a Google Cloud Storage bucket via the
    ``gsutil`` CLI into a tempdir.

    The idiomatic store for TPU-pod training data (SURVEY.md §2 providers
    row): GCS sits next to the TPU hosts, so day files stream in at full
    bandwidth without a POSIX mount.  Same contract as S3FileProvider —
    ``available_dates`` from an object listing, ``load`` fetches one day
    file, ``unload`` deletes the temp copy.  No reference counterpart
    (the reference has Local + S3 only, data_generator.py:42-93).
    """

    def __init__(self, bucket: str, *subfolders: str, pattern: str = None):
        if pattern is None:
            pattern = subfolders[-1]
            subfolders = subfolders[:-1]
        self.bucket = "/".join([bucket.removeprefix("gs://")]
                               + list(subfolders))
        if "{date" not in pattern:
            raise ValueError("Expected a {date} placeholder in " + pattern)
        self.pattern = pattern
        self._regex = _pattern_to_regex(pattern)

    @property
    def available_dates(self):
        result = subprocess.run(["gsutil", "ls", f"gs://{self.bucket}/"],
                                capture_output=True)
        dates = set()
        for line in result.stdout.decode().splitlines():
            name = line.strip().rsplit("/", 1)[-1]
            m = self._regex.match(name)
            if m:
                dates.add(m.group("date"))
        return dates

    def load(self, date: str) -> str:
        dest = tempfile.mkdtemp()
        name = re.sub(r"\{date[^}]*\}", str(int(date)), self.pattern)
        subprocess.run(
            ["gsutil", "cp", f"gs://{self.bucket}/{name}", dest + "/"],
            check=True,
        )
        return f"{dest}/{name}"

    def unload(self, loaded) -> None:
        Path(loaded).unlink(missing_ok=True)


class S3FileProvider(Provider):
    """Lists/downloads via the ``s3cmd`` CLI into a tempdir."""

    def __init__(self, bucket: str, *subfolders: str, pattern: str = None):
        if pattern is None:
            pattern = subfolders[-1]
            subfolders = subfolders[:-1]
        self.bucket = "/".join([bucket] + list(subfolders))
        if "{date" not in pattern:
            raise ValueError("Expected a {date} placeholder in " + pattern)
        self.pattern = pattern
        self._regex = _pattern_to_regex(pattern)

    @property
    def available_dates(self):
        result = subprocess.run(["s3cmd", "ls", f"s3://{self.bucket}/"],
                                capture_output=True)
        dates = set()
        for line in result.stdout.decode().splitlines():
            name = line.rsplit(f"s3://{self.bucket}/", 1)[-1]
            m = self._regex.match(name)
            if m:
                dates.add(m.group("date"))
        return dates

    def load(self, date: str) -> str:
        dest = tempfile.mkdtemp()
        name = re.sub(r"\{date[^}]*\}", str(int(date)), self.pattern)
        subprocess.run(
            ["s3cmd", "get", f"s3://{self.bucket}/{name}", dest + "/"],
            check=True,
        )
        return f"{dest}/{name}"

    def unload(self, loaded) -> None:
        Path(loaded).unlink(missing_ok=True)
