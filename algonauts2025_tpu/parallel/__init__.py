from .mesh import batch_sharding, get_mesh, init_distributed, replicated, shard_batch
from .pipeline import pipeline_scan, pipelined_llama_states
from .sequence import ring_attention_local, sequence_parallel_attention
