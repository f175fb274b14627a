"""Dataset bootstrap: download/extract/convert helpers.

Mirror of the reference's repo-root setup.py: dataset downloads (Vimeo90k
triplets, DAVIS, NFS clips — setup.py:105-136), mp4 -> per-clip PNG directory
extraction resized to 1280x720 (videos_to_images, setup.py:38-62 + :136), and
images -> video stitching.  Downloads require network egress; in offline
environments they fail with a clear message and the conversion helpers still
work on local media.
"""

from __future__ import annotations

import os
import zipfile
from typing import Optional, Sequence, Tuple

DATASET_URLS = {
    # the reference's sources (setup.py:111-132)
    "vimeo90k_triplet": "http://data.csail.mit.edu/tofu/dataset/vimeo_triplet.zip",
    "davis": "https://data.vision.ee.ethz.ch/csergi/share/davis/DAVIS-2017-trainval-480p.zip",
}


def download(url: str, dest: str, chunk: int = 1 << 20) -> str:
    """Stream a URL to dest.  Raises a clear error without network egress."""
    import urllib.error
    import urllib.request

    os.makedirs(os.path.dirname(os.path.abspath(dest)), exist_ok=True)
    try:
        with urllib.request.urlopen(url) as r, open(dest, "wb") as f:
            while True:
                buf = r.read(chunk)
                if not buf:
                    break
                f.write(buf)
    except (urllib.error.URLError, OSError) as e:
        raise ConnectionError(
            f"cannot download {url} (no network egress in this environment?); "
            f"place the archive at {dest} manually"
        ) from e
    return dest


def extract(archive: str, dest_dir: str) -> str:
    os.makedirs(dest_dir, exist_ok=True)
    with zipfile.ZipFile(archive) as z:
        z.extractall(dest_dir)
    return dest_dir


def video_to_images(
    video_path: str,
    out_dir: str,
    resize: Optional[Tuple[int, int]] = (1280, 720),
    ext: str = "png",
) -> int:
    """Extract a video into numbered frames (setup.py's videos_to_images with
    its default 1280x720 resize).  resize is (width, height) or None."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if resize is not None:
            frame = cv2.resize(frame, resize)
        cv2.imwrite(os.path.join(out_dir, f"{n:05d}.{ext}"), frame)
        n += 1
    cap.release()
    if n == 0:
        raise ValueError(f"no frames decoded from {video_path}")
    return n


def videos_to_images(video_dir: str, out_root: str, **kw) -> dict:
    """Extract every clip in a directory to <out_root>/<clipname>/ PNGs."""
    counts = {}
    for name in sorted(os.listdir(video_dir)):
        if not name.lower().endswith((".mp4", ".avi", ".mov")):
            continue
        stem = os.path.splitext(name)[0]
        counts[stem] = video_to_images(
            os.path.join(video_dir, name), os.path.join(out_root, stem), **kw
        )
    return counts


def images_to_video(frame_dir: str, out_path: str, fps: int = 30) -> str:
    """Stitch a numbered frame directory back into a video."""
    import cv2

    names = sorted(
        f for f in os.listdir(frame_dir) if f.lower().endswith((".png", ".jpg"))
    )
    if not names:
        raise ValueError(f"no frames in {frame_dir}")
    first = cv2.imread(os.path.join(frame_dir, names[0]))
    h, w = first.shape[:2]
    vw = cv2.VideoWriter(out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for n in names:
        vw.write(cv2.imread(os.path.join(frame_dir, n)))
    vw.release()
    return out_path


def bootstrap_testset(testset_dir: str, out_root: str) -> dict:
    """The reference's Testset bootstrap: Clip*.mp4 -> 1280x720 PNG dirs.
    NOTE: in this mount the reference's Testset mp4s are git-LFS pointers
    (132 bytes each) — this raises a clear error for those."""
    for name in sorted(os.listdir(testset_dir)):
        p = os.path.join(testset_dir, name)
        if name.endswith(".mp4") and os.path.getsize(p) < 1024:
            raise ValueError(
                f"{p} is a git-LFS pointer, not video data; fetch the real "
                "clips or use eval.synth / eval.evaluate's synthetic sets"
            )
    return videos_to_images(testset_dir, out_root)
