"""Fetch the published deepsignal-plant example data + pretrained ckpt.

The reference defines itself by its run on 4,000 A. thaliana R9.4 reads
with the arabnrice2-1 checkpoint (reference README.md:126-169). This rig
has zero egress, so the fetch cannot run HERE — this script makes the
real-data parity run a one-command affair the moment network appears:

    python benchmarks/fetch_real_data.py --dest benchmarks/.real_data
    python benchmarks/parity_run.py --fetch --out real_report.md

Integrity: the upstream publishes no checksums (Google Drive links
only), so verification is trust-on-first-use — the first successful
download records sha256s into benchmarks/real_data.lock.json (commit
it); later fetches verify against the lockfile and refuse mismatches.
A lockfile shipped by a maintainer who has run the fetch turns every
subsequent fetch into a pinned, verified download.

Offline behavior: --check-only (what parity_run --fetch uses first)
reports which assets are present+verified without touching the network;
a fetch attempt with no egress fails fast with a SKIP message and exit
code 3 (distinct from verification failure, exit 2).
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys
import tarfile
import urllib.error
import urllib.request

HERE = os.path.dirname(os.path.abspath(__file__))
LOCKFILE = os.path.join(HERE, "real_data.lock.json")

# Pinned upstream assets (reference README.md "Trained models" /
# "Example data"): Google Drive file ids from the published links.
ASSETS = {
    "model.dp2.CNN.arabnrice2-1_120m_R9.4plus_tem.bn13_sn16."
    "both_bilstm.epoch6.ckpt": {
        "gdrive_id": "1HnDKPEfCAXgo7vPN-zaD44Kqz1SDw160",
        "kind": "ckpt",
    },
    "fast5s.sample.tar.gz": {
        "gdrive_id": "1PauSQH-3Wpi6FNjNycH9n3GSxkW8C3s0",
        "kind": "tarball",   # 4000 A. thaliana reads + genome reference
    },
}

EXIT_VERIFY_FAIL = 2
EXIT_OFFLINE = 3


def _verify_fail(msg: str) -> "SystemExit":
    """SystemExit with the DOCUMENTED verify-failure status (2). A bare
    SystemExit("msg") would exit 1 and collapse into the generic-failure
    bucket wrappers branch on."""
    print("VERIFY FAIL: " + msg, file=sys.stderr)
    return SystemExit(EXIT_VERIFY_FAIL)


def content_looks_valid(name: str, path: str) -> str | None:
    """Magic-byte + size sanity BEFORE trusting bytes enough to pin
    them: Google Drive serves quota/virus-scan interstitials as HTML
    with status 200, and trust-on-first-use would otherwise permanently
    pin the garbage. Returns an error string, or None when plausible."""
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        head = fh.read(512)
    low = head.lstrip().lower()
    if low.startswith(b"<!doctype") or low.startswith(b"<html"):
        return "is an HTML page (Drive quota/interstitial), not data"
    kind = ASSETS.get(name, {}).get("kind")
    if kind == "tarball":
        if not head.startswith(b"\x1f\x8b"):
            return "not gzip data (bad magic)"
        if size < (1 << 20):
            return "implausibly small for the 4000-read tarball"
    elif kind == "ckpt":
        # torch checkpoints are zip archives (new format) or pickles
        if not (head.startswith(b"PK\x03\x04") or head[:1] == b"\x80"):
            return "not a torch checkpoint (neither zip nor pickle)"
        if size < (1 << 20):
            return "implausibly small for a 120M-param checkpoint"
    return None


def sha256_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for blk in iter(lambda: fh.read(chunk), b""):
            h.update(blk)
    return h.hexdigest()


def load_lock() -> dict:
    if os.path.exists(LOCKFILE):
        with open(LOCKFILE) as fh:
            return json.load(fh)
    return {}


def save_lock(lock: dict) -> None:
    with open(LOCKFILE, "w") as fh:
        json.dump(lock, fh, indent=2, sort_keys=True)
        fh.write("\n")


def _gdrive_url(file_id: str) -> str:
    return ("https://drive.usercontent.google.com/download?id={}"
            "&export=download&confirm=t".format(file_id))


def download_gdrive(file_id: str, dest: str, timeout: int = 60) -> None:
    """Download a (possibly large) Google Drive file. Large files get an
    interstitial "can't scan for viruses" HTML page; the usercontent
    endpoint with confirm=t skips it, and we still detect+retry via the
    embedded confirm token if HTML comes back."""
    url = _gdrive_url(file_id)
    req = urllib.request.Request(url, headers={"User-Agent": "curl/8"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        head = resp.read(4096)
        if head.lstrip()[:15].lower().startswith(b"<!doctype html") or \
                head.lstrip()[:5].lower().startswith(b"<html"):
            page = (head + resp.read()).decode("utf-8", "replace")
            m = re.search(r'name="uuid" value="([^"]+)"', page)
            extra = "&uuid={}".format(m.group(1)) if m else ""
            req = urllib.request.Request(url + extra,
                                         headers={"User-Agent": "curl/8"})
            with urllib.request.urlopen(req, timeout=timeout) as resp2:
                _stream_to(resp2, dest, b"")
            return
        _stream_to(resp, dest, head)


def _stream_to(resp, dest: str, head: bytes) -> None:
    tmp = dest + ".part"
    with open(tmp, "wb") as out:
        out.write(head)
        while True:
            blk = resp.read(1 << 20)
            if not blk:
                break
            out.write(blk)
    os.replace(tmp, dest)


def check_assets(dest: str) -> tuple[list[str], list[str], list[str]]:
    """-> (verified, present_unpinned, missing) asset names."""
    lock = load_lock()
    verified, unpinned, missing = [], [], []
    for name in ASSETS:
        path = os.path.join(dest, name)
        if not os.path.exists(path):
            missing.append(name)
        elif name in lock:
            if sha256_file(path) == lock[name]["sha256"]:
                verified.append(name)
            else:
                raise _verify_fail(
                    "{} does not match pinned sha256 {}"
                    .format(name, lock[name]["sha256"]))
        else:
            unpinned.append(name)
    return verified, unpinned, missing


def pin_present(dest: str, names: list[str]) -> None:
    """Pin assets already on disk (e.g. copied out-of-band onto a
    zero-egress rig) after a content sanity check — without this,
    nothing but a fresh download could ever create the lockfile."""
    lock = load_lock()
    for name in names:
        path = os.path.join(dest, name)
        err = content_looks_valid(name, path)
        if err:
            raise _verify_fail("{} {}".format(name, err))
        lock[name] = {"sha256": sha256_file(path),
                      "gdrive_id": ASSETS[name]["gdrive_id"]}
        print("pinned {} sha256={} (commit {})".format(
            name, lock[name]["sha256"][:16], os.path.basename(LOCKFILE)))
    save_lock(lock)


def unpack(dest: str) -> dict:
    """Unpack the tarball (if present) and locate the run inputs.
    -> {fast5_dir, fasta, torch_ckpt} with whatever exists."""
    out: dict = {}
    ckpt = os.path.join(
        dest, "model.dp2.CNN.arabnrice2-1_120m_R9.4plus_tem.bn13_sn16."
        "both_bilstm.epoch6.ckpt")
    if os.path.exists(ckpt):
        out["torch_ckpt"] = ckpt
    tb = os.path.join(dest, "fast5s.sample.tar.gz")
    mark = os.path.join(dest, ".unpacked")
    if os.path.exists(tb) and not os.path.exists(mark):
        with tarfile.open(tb) as tf:
            tf.extractall(dest, filter="data")
        open(mark, "w").write("ok\n")
    # locate fast5 dir + genome fasta wherever the tarball put them
    for root, dirs, files in os.walk(dest):
        if "fast5_dir" not in out and any(
                f.endswith(".fast5") for f in files):
            out["fast5_dir"] = root
        for f in files:
            if f.endswith((".fna", ".fa", ".fasta")) and "fasta" not in out:
                out["fasta"] = os.path.join(root, f)
    return out


def fetch(dest: str, check_only: bool = False) -> dict:
    os.makedirs(dest, exist_ok=True)
    verified, unpinned, missing = check_assets(dest)
    if check_only or not missing:
        if missing:
            print("MISSING: " + ", ".join(missing))
            raise SystemExit(EXIT_OFFLINE)
        if unpinned:
            # present-but-unpinned (copied out-of-band): sanity-check
            # and pin NOW — a "full fetch" only hashes what it downloads
            pin_present(dest, unpinned)
        return unpack(dest)

    lock = load_lock()
    for name in missing:
        path = os.path.join(dest, name)
        print("fetching {} ...".format(name), flush=True)
        try:
            download_gdrive(ASSETS[name]["gdrive_id"], path)
        except (urllib.error.URLError, OSError, TimeoutError) as e:
            print("SKIP: no network egress ({}) — real-data parity "
                  "cannot run on this rig; re-run when online".format(e))
            raise SystemExit(EXIT_OFFLINE)
        err = content_looks_valid(name, path)
        if err:
            raise _verify_fail(
                "downloaded {} {} — refusing to pin/keep it"
                .format(name, err))
        digest = sha256_file(path)
        if name in lock and lock[name]["sha256"] != digest:
            raise _verify_fail(
                "fresh download of {} has sha256 {} != pinned {}"
                .format(name, digest, lock[name]["sha256"]))
        if name not in lock:
            lock[name] = {"sha256": digest,
                          "gdrive_id": ASSETS[name]["gdrive_id"]}
            save_lock(lock)
            print("pinned {} sha256={} (commit {})".format(
                name, digest[:16], os.path.basename(LOCKFILE)))
    return unpack(dest)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dest", default=os.path.join(HERE, ".real_data"))
    ap.add_argument("--check-only", action="store_true",
                    help="verify what's on disk; never touch the network")
    args = ap.parse_args()
    paths = fetch(args.dest, check_only=args.check_only)
    print(json.dumps(paths, indent=2))
    need = {"fast5_dir", "fasta", "torch_ckpt"}
    if need <= set(paths):
        print("\nready — run:\n  python benchmarks/parity_run.py "
              "--fast5_dir {fast5_dir} --reference_fasta {fasta} "
              "--torch_ckpt {torch_ckpt} --motifs C --out "
              "real_report.md".format(**paths))


if __name__ == "__main__":
    main()
