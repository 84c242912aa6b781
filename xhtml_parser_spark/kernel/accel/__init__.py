"""Optional C-accelerated parse kernel.

The pure-Python kernel in ``..parser`` is the semantic source of truth
(golden-file byte identity, negative corpus, property fuzz). This
package compiles a CPython extension transcribing the SAME algorithm
-- byte-class table and entity table are GENERATED from the Python
modules at build time, so they cannot drift -- and a differential
property suite asserts C == Python on arbitrary inputs.

Loading is strictly best-effort: no compiler, no headers, sandboxed
filesystem, or any build error -> silently fall back to pure Python
(set XPS_ACCEL=0 to force the fallback, XPS_ACCEL=require to raise
instead of falling back). The .so is cached next to the source keyed
by a content hash, so workers compile at most once per machine.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import sysconfig
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))


def _gen_tables_header() -> str:
    """Generate C tables from the Python source-of-truth modules."""
    from .. import chartype, entities

    lines = ["/* GENERATED from kernel/chartype.py + kernel/entities.py */"]
    lines.append("static const unsigned char XPS_CHARTYPE[256] = {")
    lines.append(", ".join(str(b) for b in chartype.CHARTYPE))
    lines.append("};")
    ents = sorted(entities.ENTITIES.items())
    # XPS_ENT_LO/XPS_ENT_CNT below are unsigned char: if the entity
    # table ever grows past 255 entries the C ent_lookup would silently
    # truncate indices/counts and drop entities. Guard at generation
    # time AND compile time (the reference map is 129 entries).
    assert len(ents) < 256, "entity bucket tables are u8-indexed"
    lines.append(
        "typedef struct { const char *name; int nlen; const char *val; int vlen; } xps_ent;"
    )
    lines.append(f"#define XPS_N_ENTITIES {len(ents)}")
    lines.append(
        "_Static_assert(XPS_N_ENTITIES < 256, "
        '"XPS_ENT_LO/XPS_ENT_CNT are unsigned char");'
    )
    lines.append("static const xps_ent XPS_ENTITIES[XPS_N_ENTITIES] = {")
    for name, val in ents:
        nv = "".join(f"\\x{b:02x}" for b in name)
        vv = "".join(f"\\x{b:02x}" for b in val)
        lines.append(f'  {{"{nv}", {len(name)}, "{vv}", {len(val)}}},')
    lines.append("};")
    # first-char bucket index into the sorted table: narrows a lookup
    # to the same-initial run (max 10 entries) so ent_lookup does one
    # length pre-check + at most a couple of memcmps instead of a
    # ~7-probe binary search (each probe a PLT memcmp call)
    ent_lo = [0] * 256
    ent_cnt = [0] * 256
    for idx, (name, _val) in enumerate(ents):
        c0 = name[0]
        if ent_cnt[c0] == 0:
            ent_lo[c0] = idx
        ent_cnt[c0] += 1
    lines.append("static const unsigned char XPS_ENT_LO[256] = {")
    lines.append(", ".join(str(v) for v in ent_lo))
    lines.append("};")
    lines.append("static const unsigned char XPS_ENT_CNT[256] = {")
    lines.append(", ".join(str(v) for v in ent_cnt))
    lines.append("};")

    from .. import extract

    lines.append("typedef struct { const char *name; int len; } xps_tag;")

    def tagset(cname: str, tags) -> None:
        ts = sorted(tags)
        lines.append(f"#define XPS_N_{cname} {len(ts)}")
        lines.append(f"static const xps_tag XPS_{cname}[XPS_N_{cname}] = {{")
        for t in ts:
            tv = "".join(f"\\x{b:02x}" for b in t)
            lines.append(f'  {{"{tv}", {len(t)}}},')
        lines.append("};")
        # first-char -> bitmask of member lengths (all tags are < 16
        # bytes, asserted here): tag_in prefilters on one load instead
        # of walking the table for the common non-member tags
        assert all(len(t) < 16 for t in ts)
        pref = [0] * 256
        for t in ts:
            pref[t[0]] |= 1 << len(t)
        lines.append(f"static const unsigned short XPS_{cname}_PREF[256] = {{")
        lines.append(", ".join(str(v) for v in pref))
        lines.append("};")

    tagset("BLACKLIST", extract.BLACKLIST)
    tagset("BLOCK", extract.BLOCK_TAGS)
    lines.append(f"#define XPS_LINK_DENSITY_MAX {extract.LINK_DENSITY_MAX!r}")
    return "\n".join(lines)


CFLAGS = ["-O3"]  # matches the reference's own -O3 builds; measured
# +15% over -O2 on the synthetic corpus (-march=native measured slower
# and is non-portable)


def _c_source() -> bytes | None:
    """The C kernel source, whether the package sits on disk or inside
    an addPyFile/--py-files zip (zipimport path: pkgutil reads through
    the zip; os.path cannot). None when unavailable."""
    src = os.path.join(_HERE, "_cparser.c")
    if os.path.exists(src):
        with open(src, "rb") as fh:
            return fh.read()
    try:
        import pkgutil

        return pkgutil.get_data(__name__, "_cparser.c")
    except Exception:
        return None


#: why the last _build() returned None (shown by the test suite's
#: hard-failure path so a broken build is diagnosable, not a mystery)
LAST_BUILD_ERROR: str | None = None


def _build() -> str | None:
    global LAST_BUILD_ERROR
    src_bytes = _c_source()
    if src_bytes is None:
        LAST_BUILD_ERROR = "_cparser.c not found on disk or in package zip"
        return None
    # the digest covers the GENERATED header too: a table change in the
    # Python source-of-truth modules must invalidate the cached .so
    # even when _cparser.c itself is untouched
    digest = hashlib.md5(
        src_bytes + _gen_tables_header().encode() + " ".join(CFLAGS).encode()
    ).hexdigest()[:16]
    cache_dir = os.path.join(
        tempfile.gettempdir(), f"xps_accel_{digest}_py{sys.version_info[0]}{sys.version_info[1]}"
    )
    so_path = os.path.join(cache_dir, "_xps_cparser.so")
    if os.path.exists(so_path):
        return so_path
    os.makedirs(cache_dir, exist_ok=True)
    # Serialize concurrent builders (3 spark sessions importing at once
    # used to race: every per-file write below WAS atomic except the
    # generated header, so a compiler could read a half-written
    # xps_tables.h and fail -- the round-2 transient-skip root cause).
    # flock is advisory and per-open-fd, so it works across processes;
    # the .so existence re-check under the lock makes later arrivals
    # no-ops.
    import fcntl

    lock_path = os.path.join(cache_dir, ".build.lock")
    with open(lock_path, "w") as lock_fh:
        fcntl.flock(lock_fh, fcntl.LOCK_EX)
        try:
            if os.path.exists(so_path):
                return so_path
            # materialize the source next to the cache: gcc needs a
            # real file, and when loaded from a zip there is none on
            # disk. Atomic (tmp + rename) like every write here.
            src = os.path.join(cache_dir, "_cparser.c")
            src_tmp = src + f".tmp-{os.getpid()}"
            with open(src_tmp, "wb") as fh:
                fh.write(src_bytes)
            os.replace(src_tmp, src)
            hdr = os.path.join(cache_dir, "xps_tables.h")
            hdr_tmp = hdr + f".tmp-{os.getpid()}"
            with open(hdr_tmp, "w") as fh:
                fh.write(_gen_tables_header())
            os.replace(hdr_tmp, hdr)
            include = sysconfig.get_paths()["include"]
            tmp_so = so_path + f".tmp-{os.getpid()}"
            cmd = [
                "gcc", *CFLAGS, "-fPIC", "-shared", "-std=c99",
                f"-I{include}", f"-I{cache_dir}", src, "-o", tmp_so,
            ]
            try:
                proc = subprocess.run(
                    cmd, check=True, capture_output=True, timeout=120
                )
                del proc
                os.replace(tmp_so, so_path)
                return so_path
            except subprocess.CalledProcessError as e:
                LAST_BUILD_ERROR = (
                    f"gcc failed ({e.returncode}): "
                    f"{e.stderr.decode(errors='replace')[:2000]}"
                )
                return None
            except Exception as e:
                LAST_BUILD_ERROR = f"{type(e).__name__}: {e}"
                return None
        finally:
            fcntl.flock(lock_fh, fcntl.LOCK_UN)


def _load():
    global LAST_BUILD_ERROR
    mode = os.environ.get("XPS_ACCEL", "1")
    if mode == "0":
        LAST_BUILD_ERROR = "disabled via XPS_ACCEL=0"
        return None
    try:
        so_path = _build()
        if so_path is None:
            raise RuntimeError(f"accel build unavailable: {LAST_BUILD_ERROR}")
        import importlib.util

        spec = importlib.util.spec_from_file_location("_xps_cparser", so_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception as e:
        if LAST_BUILD_ERROR is None:
            LAST_BUILD_ERROR = f"{type(e).__name__}: {e}"
        if mode == "require":
            raise
        return None


cparser = _load()
