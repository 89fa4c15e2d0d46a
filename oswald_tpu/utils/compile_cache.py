"""Persistent compiled-program cache: the reference ships its compiled
kernel and loads it at startup — `PRECOMPILED_BINARY`
(/root/reference/host/src/utils.h:17) via `createProgramFromBinary`
(/root/reference/common/src/AOCL_Utils.cpp:365, utils.c:144-150) — so a
deployment never pays FPGA synthesis.  The TPU-native equivalent is JAX's
persistent compilation cache: every XLA executable the engine compiles
(per-bin scans, packed-batch rungs, top-k) is written to a directory keyed
by (HLO, compile options, device kind), and any later process — a serve
restart, the next bench run, a new pod worker — loads it instead of
recompiling.  A first-ever warmup costs ~20-40 s per program through a
remote compile service (measured 22 min for the full default ladder on the
v5e rig, engine/search.py warmup_engine); with this cache primed the same
warmup replays in seconds.

Enabled by default by every entry point (CLI search/serve/tune, bench.py);
opt out with --no-compile-cache or OSWALD_TPU_COMPILE_CACHE=0.
"""

import os
import sys

# Resolution order for the default directory (first hit wins):
#   1. OSWALD_TPU_COMPILE_CACHE env var ("0"/"" disables)
#   2. JAX_COMPILATION_CACHE_DIR env var (jax's own knob — respected as-is)
#   3. ~/.cache/oswald-tpu/xla
_ENV = "OSWALD_TPU_COMPILE_CACHE"
_DEFAULT_SUBDIR = os.path.join("oswald-tpu", "xla")

_enabled_dir: str | None = None


def default_cache_dir() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    return os.path.join(base, _DEFAULT_SUBDIR)


def enable_compile_cache(cache_dir: str | None = None,
                         quiet: bool = False) -> str | None:
    """Point JAX's persistent compilation cache at `cache_dir` (default:
    see resolution order above).  Idempotent; safe to call before or after
    jax initialises (config updates apply to subsequent compiles).  Returns
    the directory in use, or None when disabled (explicitly, via env, or
    because the config knobs are unavailable in this jax)."""
    global _enabled_dir
    env = os.environ.get(_ENV)
    if env is not None and env.strip() in ("", "0", "off", "false", "no"):
        return None
    if cache_dir is None:
        cache_dir = (env or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                     or default_cache_dir())
    if _enabled_dir == cache_dir:
        return _enabled_dir
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError as e:
        if not quiet:
            print(f"oswald-tpu: compile cache disabled ({e})",
                  file=sys.stderr)
        return None
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache EVERY program: the engine's ladder is many small-to-medium
        # programs, each 20-40 s through a remote compile service — the
        # default 1 s floor would skip exactly the programs a local CPU
        # test compiles fast but a TPU deployment pays dearly for
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # unknown flag in a future jax: degrade, don't die
        if not quiet:
            print(f"oswald-tpu: compile cache unavailable ({e})",
                  file=sys.stderr)
        return None
    _enabled_dir = cache_dir
    if not quiet:
        print(f"oswald-tpu: compile cache at {cache_dir}", file=sys.stderr)
    return cache_dir


def pack_cache(tar_path: str, cache_dir: str | None = None) -> dict:
    """Archive a warmed compile cache into one gzip tarball — the analog
    of SHIPPING the reference's precompiled `sw.aocx`: a fresh deployment
    unpacks the artifact and skips the cold warmup ladder entirely
    (measured on the v5e rig: zero recompiles after unpack; SCALING.md
    round 5).  IMPORTANT: jax's cache-key fingerprint includes the
    compilation-cache-dir config, so the artifact must be unpacked into
    the SAME configured directory path on the target machine (the
    default ~/.cache/oswald-tpu/xla ships cleanly between machines;
    unpacking into a different path silently recompiles everything —
    measured).  Returns {"entries", "bytes", "tar"}."""
    import tarfile
    d = cache_dir or _enabled_dir or default_cache_dir()
    if not os.path.isdir(d):
        raise FileNotFoundError(
            f"compile cache directory {d} does not exist — run a search/"
            "serve/bench once (with the cache enabled) to populate it")
    n = size = 0
    with tarfile.open(tar_path, "w:gz") as tf:
        for root, _, files in os.walk(d):
            for f in sorted(files):
                p = os.path.join(root, f)
                tf.add(p, arcname=os.path.relpath(p, d))
                size += os.path.getsize(p)
                n += 1
    return {"entries": n, "bytes": size, "tar": tar_path}


def unpack_cache(tar_path: str, cache_dir: str | None = None,
                 overwrite: bool = False) -> dict:
    """Pre-seed a compile cache from a `pack_cache` tarball.  Existing
    entries are kept (overwrite=False) — cache files are content-keyed,
    so a collision means the entry is already present.  Returns
    {"extracted", "skipped", "dir"}."""
    import tarfile
    d = cache_dir or _enabled_dir or default_cache_dir()
    os.makedirs(d, exist_ok=True)
    extracted = skipped = 0
    with tarfile.open(tar_path, "r:*") as tf:
        for m in tf.getmembers():
            if not m.isfile():
                continue
            # refuse path escapes (the tarball may come from elsewhere)
            dest = os.path.realpath(os.path.join(d, m.name))
            if not dest.startswith(os.path.realpath(d) + os.sep):
                raise ValueError(f"unsafe path in cache tar: {m.name!r}")
            if os.path.exists(dest) and not overwrite:
                skipped += 1
                continue
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            src = tf.extractfile(m)
            with open(dest, "wb") as out:
                out.write(src.read())
            extracted += 1
    return {"extracted": extracted, "skipped": skipped, "dir": d}


def cache_stats(cache_dir: str | None = None) -> dict:
    """Entry count and total bytes of a cache directory (for `info` and
    deployment priming checks)."""
    d = cache_dir or _enabled_dir or default_cache_dir()
    n = size = 0
    if os.path.isdir(d):
        for root, _, files in os.walk(d):
            for f in files:
                try:
                    size += os.path.getsize(os.path.join(root, f))
                    n += 1
                except OSError:
                    pass
    return {"dir": d, "entries": n, "bytes": size}
