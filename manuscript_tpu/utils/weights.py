"""Released-checkpoint bootstrap: URL fetch + sha256 verify + local cache.

Mirrors the reference's first-use weight download (reference
``src/manuscript/detectors/_east/infer.py:96-107`` fetches the EAST release
checkpoint to ``~/.manuscript/east/`` via gdown;
``src/manuscript/recognizers/_trba/__init__.py:207-243`` does the same for
the TRBA weights + config), rebuilt on the stdlib:

* ``urllib`` instead of gdown (GitHub release assets are plain HTTPS; the
  ``file://`` scheme also works, which the unit tests use);
* optional sha256 verification — a corrupted or tampered download is
  deleted and reported instead of silently loaded;
* atomic rename into the cache (a crashed download never leaves a partial
  file where the cache scan would find it).

Environment knobs:

* ``MANUSCRIPT_TPU_CACHE`` — cache root (default ``~/.manuscript_tpu``).
* ``MANUSCRIPT_TPU_NO_DOWNLOAD=1`` — never touch the network; cache-only.
  Zero-egress deployments set this to skip the connect timeout.
* ``MANUSCRIPT_TPU_<NAME>_URL`` (e.g. ``MANUSCRIPT_TPU_EAST_URL``) —
  override a release URL, e.g. to point at an internal mirror.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import warnings
from dataclasses import dataclass
from pathlib import Path
from typing import Optional


@dataclass(frozen=True)
class ReleaseArtifact:
    name: str
    url: str
    subdir: str
    filename: str
    # sha256 of the released file; None = released hash not pinned yet
    # (the reference's gdown path never verified integrity at all).
    sha256: Optional[str] = None


# The reference's released checkpoints (URLs from
# reference infer.py:96-101 and trba/__init__.py:25-32). Converted on load
# by utils/convert.py — these are torch .pth files.
RELEASES = {
    "east": ReleaseArtifact(
        name="east",
        url="https://github.com/konstantinkozhin/manuscript-ocr"
        "/releases/download/v0.1.0/east_quad_23_05.pth",
        subdir="east",
        filename="east_quad_23_05.pth",
    ),
    "trba": ReleaseArtifact(
        name="trba",
        url="https://github.com/konstantinkozhin/manuscript-ocr"
        "/releases/download/v0.1.0/trba_exp_1_64.pth",
        subdir="trba/exp_1_baseline",
        filename="weights.pth",
    ),
    "trba_config": ReleaseArtifact(
        name="trba_config",
        url="https://github.com/konstantinkozhin/manuscript-ocr"
        "/releases/download/v0.1.0/trba_exp_1_64.json",
        subdir="trba/exp_1_baseline",
        filename="config.json",
    ),
}


def cache_root() -> Path:
    return Path(
        os.environ.get("MANUSCRIPT_TPU_CACHE", Path.home() / ".manuscript_tpu")
    ).expanduser()


def _sha256_of(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_file(
    url: str,
    destination: Path,
    sha256: Optional[str] = None,
    timeout: float = 30.0,
) -> Path:
    """Fetch ``url`` to ``destination`` (atomic), verifying sha256 if given.

    Raises on network failure or digest mismatch; never leaves a partial
    file at ``destination``.
    """
    import urllib.request
    import uuid

    destination.parent.mkdir(parents=True, exist_ok=True)
    # unique temp per process: two concurrent constructors must not delete
    # or rename each other's in-flight download past the sha256 check
    tmp = destination.with_suffix(
        destination.suffix + f".{os.getpid()}.{uuid.uuid4().hex[:8]}.part"
    )
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp, open(
            tmp, "wb"
        ) as out:
            shutil.copyfileobj(resp, out)
        if sha256 is not None:
            got = _sha256_of(tmp)
            if got != sha256:
                raise RuntimeError(
                    f"sha256 mismatch for {url}: expected {sha256}, got {got}"
                )
        os.replace(tmp, destination)
    finally:
        if tmp.exists():
            tmp.unlink()
    return destination


PINNED_HASHES_FILE = (
    Path(__file__).resolve().parent.parent / "configs" / "release_hashes.json"
)


def pinned_sha256(name: str) -> Optional[str]:
    """Release sha256 for ``name``: the RELEASES entry if set, else the
    pinned-hash file written by ``examples/parity_check.py --pin-hashes``
    on a networked host (this build environment has zero egress, so the
    table ships with the pinning mechanism rather than the digests)."""
    art = RELEASES[name]
    if art.sha256 is not None:
        return art.sha256
    try:
        import json

        pinned = json.loads(PINNED_HASHES_FILE.read_text())
        return pinned.get(name)
    except (OSError, ValueError):
        return None


def pin_sha256(name: str, digest: str) -> None:
    """Record a verified release digest in the pinned-hash file (used by
    ``examples/parity_check.py --pin-hashes``)."""
    import json

    try:
        pinned = json.loads(PINNED_HASHES_FILE.read_text())
    except (OSError, ValueError):
        pinned = {}
    pinned[name] = digest
    PINNED_HASHES_FILE.write_text(json.dumps(pinned, indent=1) + "\n")


def fetch_artifact(
    name: str,
    cache_dir: Optional[Path] = None,
    quiet: bool = False,
) -> Optional[Path]:
    """Return a local path for release artifact ``name``, downloading into
    the cache on first use. Returns None when the artifact is unavailable
    (cache miss + downloads disabled or network failure) — callers decide
    whether that is fatal."""
    art = RELEASES[name]
    root = cache_dir or cache_root()
    dest = root / art.subdir / art.filename
    sha = pinned_sha256(name)
    if dest.exists():
        if sha is not None:
            got = _sha256_of(dest)
            if got != sha:
                raise RuntimeError(
                    f"cached {art.name} at {dest} fails its pinned sha256 "
                    f"(expected {sha}, got {got}) — delete it and re-fetch"
                )
        return dest
    if os.environ.get("MANUSCRIPT_TPU_NO_DOWNLOAD") == "1":
        return None
    url = os.environ.get(f"MANUSCRIPT_TPU_{art.name.upper()}_URL", art.url)
    if not quiet:
        print(f"Downloading {art.name} from {url} -> {dest}")
    try:
        return download_file(url, dest, sha256=sha)
    except Exception as exc:  # network failure, bad digest, ...
        warnings.warn(f"Could not fetch {art.name} from {url}: {exc}")
        return None


def allow_random_init_default() -> bool:
    """Whether wrappers may fall back to random weights when no checkpoint
    can be resolved. Off by default: drop-in users should get an error, not
    plausible-looking garbage predictions."""
    return os.environ.get("MANUSCRIPT_TPU_ALLOW_RANDOM_INIT") == "1"
