"""Ray Data stage bodies: stateless map_batches functions and actor-pool
callable classes."""
