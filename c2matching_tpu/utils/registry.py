"""Name->class registries.

The reference discovers classes by scanning ``*_arch.py`` / ``*_model.py`` /
``*_dataset.py`` files and looking names up with getattr
(mmsr/models/__init__.py:10-37, mmsr/models/archs/__init__.py:9-18,
mmsr/data/__init__.py:13-41). Here the same string-typed YAML dispatch is
served by explicit decorator-populated registries — no import-time directory
scans, no getattr over module lists.
"""


class Registry:

    def __init__(self, name):
        self.name = name
        self._obj_map = {}

    def register(self, obj=None, name=None):
        if obj is None:  # usage: @REGISTRY.register  or  @REGISTRY.register()
            def deco(fn_or_class):
                self._do_register(name or fn_or_class.__name__, fn_or_class)
                return fn_or_class

            return deco
        self._do_register(name or obj.__name__, obj)
        return obj

    def _do_register(self, name, obj):
        if name in self._obj_map and self._obj_map[name] is not obj:
            raise KeyError(
                f"'{name}' already registered in registry '{self.name}'")
        self._obj_map[name] = obj

    def get(self, name):
        obj = self._obj_map.get(name)
        if obj is None:
            raise KeyError(
                f"'{name}' not found in registry '{self.name}'. "
                f"Available: {sorted(self._obj_map)}")
        return obj

    def __contains__(self, name):
        return name in self._obj_map

    def keys(self):
        return self._obj_map.keys()


ARCH_REGISTRY = Registry('arch')
MODEL_REGISTRY = Registry('model')
DATASET_REGISTRY = Registry('dataset')
LOSS_REGISTRY = Registry('loss')
