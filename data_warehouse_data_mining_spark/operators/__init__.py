"""Operator library: each module registers named queries in the registry."""
