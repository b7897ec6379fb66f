"""Core runtime: pytree structures, environment base classes, spaces, registry."""
