"""Helpers to execute / import the reference implementation for golden tests.

The reference at /root/reference is pure Python; its only missing dependency
in this image is the `bgzip` module (imported but unused on our code paths),
which we stub. Reference outputs land next to the (tmp-dir) input files, never
inside /root/reference.
"""

import os
import shutil
import subprocess
import sys
import types

REFERENCE_DIR = "/root/reference"

# volatile `.kin.json` fields that legitimately differ between two runs over
# the same input file (wall-clock provenance + which script produced it)
VOLATILE_KIN_JSON_KEYS = {
    "checksum_script",
    "creation_time_start",
    "creation_time_end",
    "creation_duration",
    "output_file_ctime",
}


def import_reference_tools():
    """Import the reference's tools.py in-process (with a bgzip stub)."""
    if "bgzip" not in sys.modules:
        sys.modules["bgzip"] = types.ModuleType("bgzip")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import tools as reference_tools  # noqa

    return reference_tools


def _make_stub_dir(tmpdir):
    stub_dir = os.path.join(tmpdir, "_stubs")
    os.makedirs(stub_dir, exist_ok=True)
    with open(os.path.join(stub_dir, "bgzip.py"), "w") as fh:
        fh.write("# stub for the unused bgzip import in reference tools.py\n")
    return stub_dir


# The reference's own CLI entry is bit-rotted: create_fasta_index passes
# `sample_name=` to Header.__init__ (indexer.py:311-322) which doesn't accept
# it.  This wrapper restores the evidently-intended behaviour (sample_name
# stored for the progress print only; it is not part of the metadata schema)
# so the reference can be executed to produce golden outputs.
_INDEXER_WRAPPER = """
import sys, types
sys.modules.setdefault('bgzip', types.ModuleType('bgzip'))
sys.path.insert(0, {refdir!r})
import tools
_orig_init = tools.Header.__init__
def _init(self, project_name, *args, sample_name=None, **kwargs):
    self.sample_name = sample_name
    _orig_init(self, project_name, *args, **kwargs)
tools.Header.__init__ = _init
import indexer
sys.argv = ['indexer.py'] + sys.argv[1:]
indexer.main()
"""


def run_reference_indexer(input_file, sample_name, kmer_len, tmpdir):
    """Run `/root/reference/indexer.py <input> <sample> <K>`; returns rc."""
    stub_dir = _make_stub_dir(tmpdir)
    cwd = os.path.join(tmpdir, "refcwd")
    os.makedirs(cwd, exist_ok=True)
    # gen_checksum(os.path.basename(__file__)) opens "tools.py" relative to cwd
    if not os.path.exists(os.path.join(cwd, "tools.py")):
        shutil.copy(os.path.join(REFERENCE_DIR, "tools.py"), cwd)
    wrapper = os.path.join(cwd, "_run_indexer.py")
    with open(wrapper, "w") as fh:
        fh.write(_INDEXER_WRAPPER.format(refdir=REFERENCE_DIR))
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{stub_dir}:{REFERENCE_DIR}"
    proc = subprocess.run(
        [sys.executable, wrapper,
         os.path.abspath(input_file), sample_name, str(kmer_len)],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference indexer failed:\nstdout:\n{proc.stdout[-4000:]}\n"
            f"stderr:\n{proc.stderr[-4000:]}"
        )
    return proc


def run_reference_merger(project_name, index_files, tmpdir, extra_args=()):
    stub_dir = _make_stub_dir(tmpdir)
    cwd = os.path.join(tmpdir, "refmerge")
    os.makedirs(cwd, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{stub_dir}:{REFERENCE_DIR}"
    proc = subprocess.run(
        [sys.executable, os.path.join(REFERENCE_DIR, "merger.py"), project_name]
        + [str(p) for p in index_files] + list(extra_args),
        cwd=cwd, env=env, capture_output=True, text=True, timeout=600,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference merger failed:\nstdout:\n{proc.stdout[-4000:]}\n"
            f"stderr:\n{proc.stderr[-4000:]}"
        )
    return proc, cwd
