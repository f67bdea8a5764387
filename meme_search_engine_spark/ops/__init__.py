"""Training-data-pipeline operators: deduplication, similarity search,
text analysis, multimodal plumbing — the ops a 100 TB web-text corpus
pipeline needs around the index itself.

Reference analogues: sliding-window simhash+URL dedup
(/root/reference/src/dump_processor.rs:332-391), query-time cosine
near-dup suppression (src/query_disk_index.rs:99,514-527), CLIP-space
brute-force and DiskANN ANN search, quality scoring (meme-rater/*).
"""
