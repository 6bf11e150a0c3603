"""Model + metadata persistence (SURVEY §2.1 S14).

The reference pickles fitted sklearn models to S3 with a JSON metadata
sidecar (train date, metrics, feature list — M1.ipynb § 39-40, M2.ipynb
§ 23-24). MLlib mapping: ``model.write().overwrite().save(path)`` (a
directory of parquet + JSON Spark manages) plus our own
``metadata.json`` sidecar at the same root.
"""

from __future__ import annotations

import json
import os

from pyspark.ml import PipelineModel
from pyspark.ml.util import MLWritable


def save_model_with_metadata(model: MLWritable, path: str, metadata: dict) -> None:
    """Persist the model under ``{path}/model`` and the run metadata as
    ``{path}/metadata.json`` (human-readable sidecar, not Spark's)."""
    model.write().overwrite().save(os.path.join(path, "model"))
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(metadata, f, indent=2, sort_keys=True, default=str)


def load_model_with_metadata(path: str) -> tuple[PipelineModel, dict]:
    model = PipelineModel.load(os.path.join(path, "model"))
    with open(os.path.join(path, "metadata.json")) as f:
        return model, json.load(f)
