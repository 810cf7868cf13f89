"""Renderer models: the wavefront path-tracing integrator and AOV debug renderer."""
