"""archive-pdf-tools-tpu: TPU-native MRC PDF compression framework.

Public surface mirrors the reference package (``internetarchivepdf``):

    from archive_pdf_tools_tpu import recode
    from archive_pdf_tools_tpu.mrc import create_mrc_hocr_components
"""

import os as _os

# Honor JAX_PLATFORMS even on hosts whose sitecustomize pre-registers a
# TPU plugin before jax reads the env var (this dev image): without
# this, `JAX_PLATFORMS=cpu some-tool` still lands on the TPU and every
# op goes through the remote compile service.  A no-op when the backend
# already initialized or the value matches.
# APT_PLATFORM=cpu forces the JAX platform for any tool/CLI importing
# this package.  On hosts whose sitecustomize pre-registers a TPU
# plugin AND rewrites JAX_PLATFORMS (this dev image), the standard env
# var cannot express "run on CPU"; this package-level variable can,
# because the config update runs before the first backend use.
if _os.environ.get('APT_PLATFORM'):
    try:
        import jax as _jax
        _jax.config.update('jax_platforms', _os.environ['APT_PLATFORM'])
    except Exception:
        pass

# Persistent compile cache for EVERY entry point (conftest and the bin/
# wrappers used to set this individually; ad-hoc imports paid the full
# remote compile on each process).  Harmless when jax already
# initialized — the env var is read at first compile.
_os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/tmp/jax_cache_apt')
_os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')


def _durable_cache_dir():
    """Back /tmp/jax_cache_apt with a repo-local directory.

    /tmp is periodically cleaned on this box (2026-08-20: the warm
    cache shrank to 3 entries mid-day, which would cost a later bench
    run 20-90 s of remote compile per kernel).  Real cache files live
    in <repo>/.jax_cache; /tmp/jax_cache_apt becomes a symlink that
    any process can cheaply recreate.  Entirely best-effort: every
    failure path leaves the plain /tmp dir behavior."""
    tmp = '/tmp/jax_cache_apt'
    if _os.environ.get('JAX_COMPILATION_CACHE_DIR') != tmp:
        return                      # user pointed elsewhere: respect it
    backing = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        '.jax_cache')
    try:
        _os.makedirs(backing, exist_ok=True)
        if _os.path.islink(tmp):
            return                  # already migrated
        if _os.path.isdir(tmp):
            # adopt any entries a pre-migration process wrote, then
            # swap the dir for a symlink (rename is atomic; losing the
            # race to another process just leaves their symlink)
            import shutil
            for name in _os.listdir(tmp):
                dst = _os.path.join(backing, name)
                if not _os.path.exists(dst):
                    try:
                        shutil.copy2(_os.path.join(tmp, name), dst)
                    except OSError:
                        pass
            aside = tmp + '.old.%d' % _os.getpid()
            _os.rename(tmp, aside)
            shutil.rmtree(aside, ignore_errors=True)
        _os.symlink(backing, tmp)
    except OSError:
        pass


_durable_cache_dir()

from .const import VERSION, PRODUCER, __version__  # noqa: F401


def recode(*args, **kwargs):
    """Lazy alias of pipeline.recode.recode (keeps import light)."""
    from .pipeline.recode import recode as _recode
    return _recode(*args, **kwargs)
