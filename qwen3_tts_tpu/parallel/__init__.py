from .mesh import (make_mesh, talker_shardings, shard_talker_weights,
                   shard_gen_state, shard_consts)

__all__ = ["make_mesh", "talker_shardings", "shard_talker_weights",
           "shard_gen_state", "shard_consts"]
