"""Checksum-verified dataset downloader (rebuild of the reference's
``maybe_download`` helpers, SURVEY.md §2.1 #2 — ``Input_Pipeline/<dataset>.py``
[ref-expected]).

The build environment is offline, so downloading is strictly opt-in
(``prepare --download``): each source file is fetched only if missing or
checksum-stale, verified against a pinned MD5, and archives are extracted
into ``raw_dir`` in the layout ``prepare_<dataset>`` expects. Offline use is
unchanged — conversion never requires the network.
"""

from __future__ import annotations

import hashlib
import os
import tarfile
from dataclasses import dataclass
from typing import Tuple


@dataclass(frozen=True)
class Source:
    url: str
    filename: str
    md5: str
    extract: bool = False  # tar archive to unpack after download


MNIST_BASE = "https://ossci-datasets.s3.amazonaws.com/mnist/"

SOURCES = {
    "mnist": (
        Source(MNIST_BASE + "train-images-idx3-ubyte.gz",
               "train-images-idx3-ubyte.gz", "f68b3c2dcbeaaa9fbdd348bbdeb94873"),
        Source(MNIST_BASE + "train-labels-idx1-ubyte.gz",
               "train-labels-idx1-ubyte.gz", "d53e105ee54ea40749a09fcbcd1e9432"),
        Source(MNIST_BASE + "t10k-images-idx3-ubyte.gz",
               "t10k-images-idx3-ubyte.gz", "9fb629c4189551a2d022fa330f9573f3"),
        Source(MNIST_BASE + "t10k-labels-idx1-ubyte.gz",
               "t10k-labels-idx1-ubyte.gz", "ec29112dd5afa0611ce80d1b7f02629c"),
    ),
    "cifar10": (
        Source("https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz",
               "cifar-10-python.tar.gz", "c58f30108f718f92721af3b95e74349a",
               extract=True),
    ),
    "svhn": (
        Source("http://ufldl.stanford.edu/housenumbers/train_32x32.mat",
               "train_32x32.mat", "e26dedcc434d2e4c54c9b2d4a06d8373"),
        Source("http://ufldl.stanford.edu/housenumbers/test_32x32.mat",
               "test_32x32.mat", "eb5a983be6a315427106f1b164d9cef3"),
    ),
    "stl10": (
        Source("http://ai.stanford.edu/~acoates/stl10/stl10_binary.tar.gz",
               "stl10_binary.tar.gz", "91f7769df0f17e558f3565bffb0c7dfb",
               extract=True),
    ),
}


def md5_of(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def fetch(src: Source, raw_dir: str, progress: bool = True) -> str:
    """Download one source into raw_dir (skipping a checksum-valid existing
    file), verify its MD5, and extract it if it is an archive. Returns the
    local path. Raises on checksum mismatch (the partial file is removed)."""
    import urllib.request

    os.makedirs(raw_dir, exist_ok=True)
    path = os.path.join(raw_dir, src.filename)
    cached = os.path.exists(path) and md5_of(path) == src.md5
    if not cached:
        tmp = path + ".part"
        urllib.request.urlretrieve(src.url, tmp)
        got = md5_of(tmp)
        if got != src.md5:
            os.remove(tmp)
            raise IOError(
                f"checksum mismatch for {src.url}: expected {src.md5}, got {got}"
            )
        os.replace(tmp, path)
    if src.extract:
        # Skip re-extraction only when a sentinel records that THIS verified
        # archive was already fully unpacked (STL-10's 2.6 GB tarball takes
        # minutes); a pre-copied or interrupted-run tarball has no sentinel
        # and still gets extracted. filter="data" rejects path-traversal
        # members (and silences the 3.12+ default-filter deprecation);
        # older Pythons lack the kwarg.
        sentinel = path + ".extracted"
        done = False
        if cached and os.path.exists(sentinel):
            # Sentinel line 1 is the archive md5; the rest are the top-level
            # members it produced. Skip only if those still exist, so a
            # deleted/partially-removed extracted tree self-heals instead of
            # failing later with no hint.
            lines = open(sentinel).read().splitlines()
            done = bool(lines) and lines[0] == src.md5 and all(
                os.path.exists(os.path.join(raw_dir, m)) for m in lines[1:]
            )
        if not done:
            with tarfile.open(path) as tf:
                tops = sorted({m.name.split("/", 1)[0] for m in tf.getmembers()})
                try:
                    tf.extractall(raw_dir, filter="data")
                except TypeError:
                    tf.extractall(raw_dir)
            with open(sentinel, "w") as f:
                f.write("\n".join([src.md5] + tops) + "\n")
    if progress and not cached:
        print(f"downloaded {src.filename} ({src.md5})")
    return path


def download_dataset(name: str, raw_dir: str) -> Tuple[str, ...]:
    """Fetch + verify every source file for ``name`` into ``raw_dir``."""
    if name not in SOURCES:
        raise KeyError(f"no download sources for '{name}'; "
                       f"available: {sorted(SOURCES)}")
    return tuple(fetch(s, raw_dir) for s in SOURCES[name])
