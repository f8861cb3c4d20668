"""The reference's ingestion pipeline, Spark-first.

The reference (`timfpark/iceberg-file-writer`) is a 3-stage streaming
pipeline: FileStreamAdapter → BlockManager → FilesystemStorageAdapter
(reference main.go:18-93). Its entire computation — decode, partition by
`user_id`, buffer into ≤4096-row blocks with a 60 s age bound, write
sorted snappy-compressed files — maps onto a handful of Spark write
options (SURVEY.md §2.1):

- batch.py:      the batch formulation (ops #1-#5, #7, #8)
- streaming.py:  the Structured Streaming formulation (ops #6, #8, #9)
- maintenance.py: compaction/cleanup (the commit lifecycle generalized)
"""
