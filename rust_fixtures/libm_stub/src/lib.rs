//! Offline stand-in for the `libm` crate: the reference only calls these four
//! functions (reference src/prelude/bfuse.rs:6,102), all of which are exact
//! operations that std implements identically to libm on finite inputs.
pub fn floor(x: f64) -> f64 {
    x.floor()
}
pub fn fmax(a: f64, b: f64) -> f64 {
    a.max(b)
}
pub fn log(x: f64) -> f64 {
    x.ln()
}
pub fn round(x: f64) -> f64 {
    x.round()
}
