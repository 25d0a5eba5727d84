"""biomedical_ner_ray — a Ray-Data-native knowledge-graph construction engine.

From-scratch re-expression of the semantics of ``ourahma/biomedical-ner``
(reference at /root/reference, cited by file:line in docstrings) as a
streaming Ray Data pipeline: Parquet transcripts → tokenize → dictionary
NER tagging (BIO) → mention extraction → entity linking → triple
extraction → canonicalization → node/edge Parquet tables.

Layout
------
- ``kernels/``   pure row-local functions shared between the single-process
  oracle and the Ray stages (tokenizer regex, BIO decode, greedy dictionary
  tagger, relation heuristics). Sharing one kernel module is what makes the
  distributed pipeline conformance-exact vs the oracle.
- ``stages/``    Ray Data ``map_batches`` stages (stateless fns + actor pools).
- ``sources/``   readers (transcript parquet, CoNLL TSV, NCBI-style markup).
- ``pipelines/`` end-to-end composed pipelines with per-stage lineage
  manifests and resume.
- ``state/``     broadcast helpers + manifest/checkpoint layer.
- ``fixtures.py`` deterministic synthetic transcript/alias-dict generator.
- ``oracle.py``  single-process reference-semantics implementation.
"""

__version__ = "0.1.0"
