"""Persistent-compile-cache directory selection.

XLA:CPU AOT cache entries encode the *compiling* host's CPU features
(avx512 variants, prefer-no-scatter/gather, ...).  This machine is a VM
that can live-migrate between hosts with different CPUs; after a
migration XLA loads the stale entries anyway (cpu_aot_loader warning
"machine type ... doesn't match") and the compiled code's different
instruction selection SHIFTS NUMERICS — enough to break 1e-6 parity
tests.  Keying the CPU cache directory by a hash of the host's CPU
feature flags makes a migration start a fresh cache instead of silently
loading incompatible code.  TPU executables are host-CPU-independent,
so the TPU cache dir stays unkeyed and survives migrations.
"""

from __future__ import annotations

import hashlib


def host_cpu_tag() -> str:
    """Short stable hash of the host's CPU identity.

    Hashes the model identity lines (vendor/family/model/stepping/model
    name) AND the feature flags.  Flags alone are not enough: LLVM derives
    tuning pseudo-features like prefer-no-gather/prefer-no-scatter (the
    Downfall gather-slowdown mitigation) from the CPU *model*, so two
    hosts with identical CPUID flags but different models produce
    incompatible AOT entries (observed 8/18: entries compiled with
    +prefer-no-scatter loaded on a flags-identical host without it ->
    enhance output collapsed to ~0)."""
    try:
        with open("/proc/cpuinfo") as f:
            ident, flags = [], ""
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("vendor_id", "cpu family", "model",
                           "model name", "stepping"):
                    ident.append(line.strip())
                elif key == "flags" and not flags:
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                if flags and len(ident) >= 5:
                    break
            if ident or flags:
                blob = "|".join(sorted(set(ident))) + "||" + flags
                return hashlib.sha256(blob.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform
    return hashlib.sha256(platform.processor().encode()).hexdigest()[:8]


def cache_dir(platform: str | None) -> str:
    """Compile-cache directory for the given jax platform override
    (None = default backend, normally the TPU)."""
    if platform and platform not in ("axon", "tpu"):
        return f"/tmp/jax_cache_{platform}_{host_cpu_tag()}"
    return "/tmp/jax_cache_tpu"
