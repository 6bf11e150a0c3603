"""ML surface (SURVEY §2.10): MLlib pipelines + the pieces MLlib lacks.

- splits.py    entity-aware train/test split and group k-fold (M9/M10 —
               GroupKFold is absent from MLlib; fold assignment is a
               deterministic hash of the entity key, which scales to any
               row count without a driver-side entity list)
- pipeline.py  balanced class weights (M4), PCA-by-variance wrapper (M2),
               assembler/scaler/classifier pipelines (M1-M7), evaluators
               (M11), baseline heuristics (M12)
"""
