use xhtml_parser::document::Document;

fn main() {
    let args: Vec<String> = std::env::args().collect();
    let file = &args[1];
    let mode = if args.len() > 2 { args[2].clone() } else { "cold".into() };
    let contents = std::fs::read(file).expect("read");
    if mode == "verify" {
        let document = Document::new(contents).expect("parse");
        // cross-check hook: node count + total text bytes must match
        // the Python/C kernel's numbers for the same file
        let n_nodes = document.last_node_idx();
        let mut text_bytes = 0usize;
        let mut n_text = 0usize;
        for node in document.all_nodes() {
            if node.is_text() {
                n_text += 1;
                text_bytes += node.text().map(|t| t.len()).unwrap_or(0);
            }
        }
        println!("last_node_idx={} n_text={} text_bytes={}", n_nodes, n_text, text_bytes);
    } else if mode == "cold" {
        let start = std::time::Instant::now();
        let document = Document::new(contents);
        let d = start.elapsed();
        println!("{}", d.as_nanos());
        assert!(document.is_ok());
    } else {
        let warm_runs: usize = mode.parse().unwrap();
        let mut best = u128::MAX;
        for _ in 0..warm_runs {
            let c = contents.clone();
            let start = std::time::Instant::now();
            let document = Document::new(c);
            let d = start.elapsed().as_nanos();
            assert!(document.is_ok());
            if d < best { best = d; }
        }
        println!("{}", best);
    }
}
