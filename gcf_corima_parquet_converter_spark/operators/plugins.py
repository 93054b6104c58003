"""Plugin (UDF) pipeline: discovery, chaining, tagging — the engine's
user-extension surface (U1/U2/U3).

Reference semantics: the DataToolkit pipeline discovers plugin classes
from ``.py`` files dropped in a folder (each must export ``PluginClass``,
``wheelhouse/stdatalog_dtk-1.0.0-py3-none-any.whl!stdatalog_dtk/
HSD_DataToolkit_Pipeline.py:44-61,91-105``), chains them so each
plugin's ``process(data)`` output feeds the next
(``…Pipeline.py:134-138``), and fans control events to every plugin via
``start_log_cb/stop_log_cb/tag_cb`` (``…Pipeline.py:7-28,125-127``).

Spark-first mapping: a plugin is a *DataFrame transform* — lazy plan
surgery, not per-record Python.  The chain composes with
``DataFrame.transform`` so Catalyst sees ONE fused logical plan across
all plugins (filters still push down through plugin boundaries, columns
still prune).  Only a plugin that genuinely needs imperative batch
logic drops to ``mapInPandas`` via :class:`PandasBatchPlugin`, which
keeps Arrow batching and a declared output schema (the record-batch IR
of ``…Pipeline.py:30-34`` becomes the pandas batch).
"""

from __future__ import annotations

import importlib.util
import sys
from abc import ABC, abstractmethod
from collections.abc import Callable, Iterator, Sequence
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PLUGIN_EXPORT = "PluginClass"


class Plugin(ABC):
    """A composable DataFrame transform with lifecycle hooks (U1).

    ``process`` must be pure plan construction (no actions, no
    ``collect``): the chain is built once on the driver and executed
    lazily.  Lifecycle callbacks mirror the reference plugin ABC
    (``…Pipeline.py:7-28``); in batch they bracket the chain build, in
    streaming they are called from query-listener events.
    """

    name: str = "plugin"

    @abstractmethod
    def process(self, df: DataFrame) -> DataFrame: ...

    def start_log_cb(self) -> None:  # pragma: no cover - default no-op
        pass

    def stop_log_cb(self) -> None:  # pragma: no cover - default no-op
        pass

    def tag_cb(self, status: bool, label: str) -> None:  # pragma: no cover
        pass


class FunctionPlugin(Plugin):
    """Adapt a plain ``DataFrame -> DataFrame`` callable to the ABC."""

    def __init__(self, fn: Callable[[DataFrame], DataFrame], name: str | None = None):
        self.fn = fn
        self.name = name or getattr(fn, "__name__", "fn")

    def process(self, df: DataFrame) -> DataFrame:
        return self.fn(df)


class PandasBatchPlugin(Plugin):
    """Imperative per-batch plugin (U3): the escape hatch for logic the
    DataFrame API can't express.  ``fn`` receives pandas DataFrames
    (Arrow batches — the Spark twin of the reference's
    ``HSD_DataToolkit_data`` record batch, ``…Pipeline.py:30-34``) and
    yields transformed batches matching ``schema``.  Batch-at-a-time,
    never row-at-a-time: ~10-100x cheaper serialization than plain
    Python UDFs.
    """

    def __init__(self, fn, schema, name: str | None = None):
        self.fn = fn
        self.schema = schema
        self.name = name or getattr(fn, "__name__", "pandas_fn")

    def process(self, df: DataFrame) -> DataFrame:
        fn = self.fn  # don't capture self in the serialized closure

        def run(batches: Iterator) -> Iterator:
            for batch in batches:
                out = fn(batch)
                if out is not None and len(out):
                    yield out

        return df.mapInPandas(run, schema=self.schema)


class PluginChain:
    """Ordered plugin composition (U1 chain loop, ``…Pipeline.py:134-138``).

    ``apply`` folds the frame through every plugin with
    ``DataFrame.transform`` — the result is one lazy plan; Catalyst
    optimizes across plugin boundaries.  ``tag`` fans a label-state
    change to all plugins (T7, ``…Pipeline.py:125-127``).
    """

    def __init__(self, plugins: Sequence[Plugin] = ()):
        self.plugins: list[Plugin] = list(plugins)
        for p in self.plugins:
            self._validate(p)

    @staticmethod
    def _validate(plugin: Plugin) -> None:
        if not callable(getattr(plugin, "process", None)):
            raise TypeError(f"plugin {plugin!r} has no callable process()")

    def add(self, plugin: Plugin) -> "PluginChain":
        self._validate(plugin)
        self.plugins.append(plugin)
        return self

    def apply(self, df: DataFrame) -> DataFrame:
        for p in self.plugins:
            p.start_log_cb()
        for p in self.plugins:
            df = df.transform(p.process)
        for p in self.plugins:
            p.stop_log_cb()
        return df

    def tag(self, status: bool, label: str) -> None:
        for p in self.plugins:
            p.tag_cb(status, label)


def discover_plugins(folder: str | Path) -> list[Plugin]:
    """Drop-a-file plugin discovery (U2, ``…Pipeline.py:44-61,91-105``):
    import every ``*.py`` in ``folder``; each must export a
    ``PluginClass`` attribute (a Plugin subclass or zero-arg factory).
    Validation happens here, at plan-build time — a malformed plugin
    fails the driver fast instead of a task at runtime.
    """
    folder = Path(folder)
    plugins: list[Plugin] = []
    for py in sorted(folder.glob("*.py")):
        spec = importlib.util.spec_from_file_location(f"_sg_plugin_{py.stem}", py)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[spec.name] = mod
        spec.loader.exec_module(mod)
        cls = getattr(mod, PLUGIN_EXPORT, None)
        if cls is None:
            raise ValueError(f"{py}: missing {PLUGIN_EXPORT} export")
        plugin = cls() if isinstance(cls, type) else cls
        if not isinstance(plugin, Plugin) and not callable(
            getattr(plugin, "process", None)
        ):
            raise TypeError(f"{py}: {PLUGIN_EXPORT} is not a Plugin")
        plugins.append(plugin)
    return plugins


def tag_column(df: DataFrame, label: str, col: str = "tag") -> DataFrame:
    """Attach the active tag label to every row (the batch twin of the
    reference's do_tag fan-out, ``…Pipeline.py:125-127``)."""
    return df.withColumn(col, F.lit(label))
