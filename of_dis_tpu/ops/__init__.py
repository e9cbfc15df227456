"""Core image/patch ops."""
