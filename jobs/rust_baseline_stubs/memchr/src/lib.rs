//! Delegates to glibc's SIMD memchr (same quality as the real crate's
//! x86 path) so the benchmark comparison stays fair.
use core::ffi::c_void;
extern "C" {
    #[link_name = "memchr"]
    fn c_memchr(s: *const c_void, c: i32, n: usize) -> *const c_void;
}

#[inline]
pub fn memchr(needle: u8, hay: &[u8]) -> Option<usize> {
    unsafe {
        let p = c_memchr(hay.as_ptr() as *const c_void, needle as i32, hay.len());
        if p.is_null() { None } else { Some(p as usize - hay.as_ptr() as usize) }
    }
}

#[inline]
pub fn memchr2(n1: u8, n2: u8, hay: &[u8]) -> Option<usize> {
    match (memchr(n1, hay), memchr(n2, hay)) {
        (Some(a), Some(b)) => Some(a.min(b)),
        (Some(a), None) => Some(a),
        (None, b) => b,
    }
}

pub struct Memchr<'a> { hay: &'a [u8], pos: usize, needle: u8 }
impl<'a> Iterator for Memchr<'a> {
    type Item = usize;
    #[inline]
    fn next(&mut self) -> Option<usize> {
        let i = memchr(self.needle, &self.hay[self.pos..])?;
        let at = self.pos + i;
        self.pos = at + 1;
        Some(at)
    }
}

#[inline]
pub fn memchr_iter(needle: u8, hay: &[u8]) -> Memchr<'_> {
    Memchr { hay, pos: 0, needle }
}
