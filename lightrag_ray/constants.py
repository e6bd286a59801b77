"""Pipeline constants.

Values mirror the reference defaults (see /root/reference/lightrag/constants.py)
so that outputs are comparable; they are plain module constants here because the
Ray pipeline carries configuration in :class:`lightrag_ray.config.PipelineConfig`.
"""

# Separator used by the reference when flattening multi-valued fields into
# scalar strings (reference: lightrag/constants.py:49).  Our tables keep Arrow
# list<string> columns; this separator only appears in the optional
# reference-parity projection and when splitting values coming *from* the
# reference.
GRAPH_FIELD_SEP = "<SEP>"

# Entity identifier caps (reference: lightrag/constants.py:18-23).
ENTITY_NAME_MAX_LENGTH = 256
ENTITY_NAME_MAX_BYTES = 512

# Extraction response caps (reference: lightrag/constants.py:26-27).  These cap
# what a (real or simulated) model is allowed to emit per chunk; the parser does
# not enforce them.
MAX_EXTRACTION_RECORDS = 100
MAX_EXTRACTION_ENTITIES = 40

# Description-merge / summarization knobs (reference: lightrag/constants.py:30-36).
FORCE_LLM_SUMMARY_ON_MERGE = 8
SUMMARY_MAX_TOKENS = 1200
SUMMARY_LENGTH_RECOMMENDED = 600
SUMMARY_CONTEXT_SIZE = 12000

# Gleaning (reference: lightrag/constants.py:17).
MAX_GLEANING = 1

# Provenance caps (reference: lightrag/constants.py:66-79).
MAX_SOURCE_IDS_PER_ENTITY = 200
MAX_SOURCE_IDS_PER_RELATION = 200
SOURCE_IDS_LIMIT_KEEP = "KEEP"
SOURCE_IDS_LIMIT_FIFO = "FIFO"
DEFAULT_SOURCE_IDS_LIMIT_METHOD = SOURCE_IDS_LIMIT_KEEP
MAX_FILE_PATHS = 75
FILE_PATH_MORE_PLACEHOLDER = "truncated"

# Chunking defaults (reference: lightrag/chunker/token_size.py:135-136).
CHUNK_TOKEN_SIZE = 1200
CHUNK_OVERLAP_TOKEN_SIZE = 100

# Extraction delimiters (reference: lightrag/prompt.py:12-13).
TUPLE_DELIMITER = "<|#|>"
COMPLETION_DELIMITER = "<|COMPLETE|>"

# Default file_path value when a mention has no provenance
# (reference: lightrag/operate.py:618,702).
UNKNOWN_SOURCE = "unknown_source"
