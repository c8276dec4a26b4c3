"""Pluggable byte-IO backends behind one ``get()``.

Parity target: mmsr/utils/file_client.py (:24-218). Disk is the primary
backend; memcached/ceph/lmdb keep the same interface and raise with clear
messages when their client libraries are absent in this environment.
"""
from abc import ABCMeta, abstractmethod


class BaseStorageBackend(metaclass=ABCMeta):

    @abstractmethod
    def get(self, filepath):
        pass


class HardDiskBackend(BaseStorageBackend):
    """Raw bytes from the local filesystem."""

    def get(self, filepath):
        with open(str(filepath), 'rb') as f:
            return f.read()


class MemcachedBackend(BaseStorageBackend):

    def __init__(self, server_list_cfg, client_cfg, sys_path=None):
        raise ImportError(
            'memcached backend requires the mc package, which is not '
            'available in this environment.')

    def get(self, filepath):
        raise NotImplementedError


class CephBackend(BaseStorageBackend):

    def __init__(self, path_mapping=None):
        raise ImportError(
            'ceph backend requires the ceph package, which is not '
            'available in this environment.')

    def get(self, filepath):
        raise NotImplementedError


class LmdbBackend(BaseStorageBackend):
    """lmdb key-value backend (per-key environments,
    file_client.py:103-167). Without the lmdb package, falls back to the
    in-repo API-compatible store (utils/lmdb_shim.py) — same code path,
    shim storage engine; real lmdb databases still require the package."""

    def __init__(self, db_paths, client_keys='default', readonly=True,
                 lock=False, readahead=False, **kwargs):
        try:
            import lmdb
        except ImportError:
            import logging
            from ..utils import lmdb_shim as lmdb
            logging.getLogger('base').info(
                'lmdb package not available; using the in-repo fallback '
                'key-value store (c2matching_tpu/utils/lmdb_shim.py)')
        if isinstance(client_keys, str):
            client_keys = [client_keys]
        if isinstance(db_paths, str):
            db_paths = [db_paths]
        assert len(client_keys) == len(db_paths)
        self._client = {
            client_key: lmdb.open(path, readonly=readonly, lock=lock,
                                  readahead=readahead, **kwargs)
            for client_key, path in zip(client_keys, db_paths)
        }

    def get(self, filepath, client_key):
        client = self._client[client_key]
        with client.begin(write=False) as txn:
            return txn.get(str(filepath).encode('ascii'))


class FileClient:
    """Dispatches ``get`` to the configured backend
    (file_client.py:170-218)."""

    _backends = {
        'disk': HardDiskBackend,
        'memcached': MemcachedBackend,
        'ceph': CephBackend,
        'lmdb': LmdbBackend,
    }

    def __init__(self, backend='disk', **kwargs):
        if backend not in self._backends:
            raise ValueError(
                f'Backend {backend} is not supported. Currently supported '
                f'ones are {list(self._backends)}')
        self.backend = backend
        self.client = self._backends[backend](**kwargs)

    def get(self, filepath, client_key='default'):
        if self.backend == 'lmdb':
            return self.client.get(filepath, client_key)
        return self.client.get(filepath)
